package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal._

/** Multimodal binary-column plumbing: schema, batch decode shape,
  * determinism under re-run (task-retry idempotency). */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def media(): Seq[MediaRow] =
    (0 until 20).map { i =>
      val payload = Array.tabulate[Byte](50 + i * 3)(j => ((i * 31 + j) % 251).toByte)
      MediaRow(i.toLong, Seq("image", "audio", "video")(i % 3),
        width = 64 + i, height = 48, sample_rate = 16000, n_frames = i,
        payload = payload)
    }

  test("extractFeatures decodes whole partitions to fixed-width features") {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val ds = spark.createDataset(media()).repartition(4)
    val feats = extractFeatures(ds, new FakeDecoder(8)).collect()
      .sortBy(_.media_id)
    assert(feats.length == 20)
    assert(feats.forall(_.features.length == 8))
    // metadata-only fields survive without decode
    assert(feats.map(_.n_bytes).toSeq == (0 until 20).map(i => 50L + i * 3))
    // deterministic: re-running yields identical features (retry safety)
    val again = extractFeatures(ds, new FakeDecoder(8)).collect()
      .sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features)
    })
    // feature 0 is payload length; feature 3 is width*height
    assert(feats(2).features(0) == 56f)
    assert(feats(2).features(3) == 66f * 48)
  }

  test("resize rewrites dims and scales payloads without decode-side state") {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val ds = spark.createDataset(media()).repartition(4)
    val out = resize(ds, 32, 24).collect().sortBy(_.media_id)
    assert(out.length == 20)
    assert(out.forall(r => r.width == 32 && r.height == 24))
    // payload size tracks the pixel-count ratio (source dims vary by row)
    out.zip(media().sortBy(_.media_id)).foreach { case (r, src) =>
      val expected = math.max((src.payload.length *
        (32L * 24) / (src.width.toLong * src.height)).toInt, 1)
      assert(r.payload.length == expected)
    }
    // deterministic under re-run (task-retry idempotency)
    val again = resize(ds, 32, 24).collect().sortBy(_.media_id)
    assert(out.zip(again).forall { case (a, b) =>
      a.payload.sameElements(b.payload)
    })
  }

  test("sampleFrames emits every Nth frame of video rows only") {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val ds = spark.createDataset(media()).repartition(4)
    val frames = sampleFrames(ds, 3).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    val videos = media().filter(_.kind == "video")
    // one row per sampled frame index: 0, 3, 6, ... < n_frames
    val expected = videos.flatMap(v =>
      (0 until v.n_frames by 3).map(f => (v.media_id, f)))
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSeq == expected)
    // frame slices concatenate back to a prefix-partition of the payload:
    // every byte comes from the source row's own payload slice
    val byId = videos.map(v => v.media_id -> v).toMap
    frames.foreach { f =>
      val src = byId(f.media_id)
      val n = math.max(src.n_frames, 1)
      val from = (src.payload.length.toLong * f.frame_idx / n).toInt
      assert(f.payload.sameElements(
        src.payload.slice(from,
          (src.payload.length.toLong * (f.frame_idx + 1) / n).toInt)))
    }
  }
}
