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
}
