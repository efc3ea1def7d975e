package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal column support: media as opaque `binary` payloads with
  * typed metadata, processed by whole-partition batch operators
  * (BASELINE.json north star: "multimodal columns").
  *
  * The actual codec libraries (image/audio/video decode) are NOT in
  * this environment, so [[MediaDecoder]] is the seam: the Spark-side
  * plumbing — schema, batch shape, partition-level operator, feature
  * array contract — is real and tested with [[FakeDecoder]]; a
  * production decoder drops in without touching the plan.
  *
  * Scale shape: rows never leave executors; decode runs per partition
  * over an iterator (no per-row UDF dispatch, no driver collect), so
  * the operator streams through 100 TB of media the same way M3
  * streams model scoring.
  */
object Multimodal {

  /** One media row: opaque payload + the typed metadata the pipeline
    * needs without decoding (the "never decode to answer a metadata
    * query" rule). */
  final case class MediaRow(
      media_id: Long, kind: String, // image | audio | video
      width: Int, height: Int, sample_rate: Int, n_frames: Int,
      payload: Array[Byte])

  /** Decoded-feature row: fixed-width float features per media item. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** The decode seam. Implementations must be deterministic per payload
    * (idempotent re-runs under task retries). */
  trait MediaDecoder extends Serializable {
    /** Feature width this decoder emits (fixed per decoder). */
    def featureWidth: Int
    /** Decode one payload to features; called once per row from a
      * partition-level batch loop. */
    def decode(row: MediaRow): Array[Float]
  }

  /** Deterministic stand-in for the real codec stack: byte-statistics
    * "features" (moments + head bytes), stable across retries. A real
    * implementation would JNI/FFI into an image or audio library here.
    */
  final class FakeDecoder(override val featureWidth: Int = 8)
      extends MediaDecoder {
    override def decode(row: MediaRow): Array[Float] = {
      val b = row.payload
      val n = math.max(b.length, 1)
      var sum = 0.0; var sumSq = 0.0
      var i = 0
      while (i < b.length) {
        val v = b(i) & 0xff
        sum += v; sumSq += v.toDouble * v
        i += 1
      }
      val mean = sum / n
      val variance = math.max(sumSq / n - mean * mean, 0.0)
      val out = new Array[Float](featureWidth)
      out(0) = b.length.toFloat
      out(1) = mean.toFloat
      out(2) = math.sqrt(variance).toFloat
      out(3) = row.width.toFloat * row.height
      var k = 4
      while (k < featureWidth) {
        out(k) = if (b.length > k - 4) (b(k - 4) & 0xff).toFloat else 0f
        k += 1
      }
      out
    }
  }

  private implicit val featEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** The feature-extraction operator: whole-partition batch decode.
    * Equivalent of a vectorized-batch decode UDF — rows stream through
    * the decoder without per-row dispatch overhead or driver collect.
    */
  def extractFeatures(media: Dataset[MediaRow], decoder: MediaDecoder)
      : Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      it.map { row =>
        MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
          decoder.decode(row))
      }
    }

  /** The resample seam: re-encode one payload at the target dims.
    * Implementations must be deterministic per (payload, w, h). */
  trait MediaResizer extends Serializable {
    def resize(row: MediaRow, width: Int, height: Int): Array[Byte]
  }

  /** Deterministic stand-in for a real resampler: nearest-neighbor
    * byte sampling scaled by the pixel-count ratio — payload size
    * tracks the target dims the way a raw raster's would. */
  final class FakeResizer extends MediaResizer {
    override def resize(row: MediaRow, width: Int, height: Int)
        : Array[Byte] = {
      val src = row.payload
      if (src.isEmpty) return Array.emptyByteArray
      val srcPx = math.max(row.width.toLong * row.height, 1L)
      val outLen = math.max(
        (src.length * (width.toLong * height) / srcPx).toInt, 1)
      Array.tabulate[Byte](outLen) { j =>
        src(((j.toLong * src.length) / outLen).toInt)
      }
    }
  }

  private implicit val mediaEnc: Encoder[MediaRow] =
    Encoders.product[MediaRow]

  /** Resize operator: a pure per-partition map — metadata is rewritten
    * to the target dims alongside the resampled payload, so downstream
    * metadata queries never decode. No shuffle, no driver hop. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int,
      resizer: MediaResizer = new FakeResizer): Dataset[MediaRow] =
    media.mapPartitions { it =>
      it.map { row =>
        row.copy(width = width, height = height,
          payload = resizer.resize(row, width, height))
      }
    }

  /** One sampled frame from a video payload. */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, n_frames: Int,
      payload: Array[Byte])

  /** The frame-extraction seam: pull one frame's bytes out of a video
    * payload. Deterministic per (payload, frameIdx). */
  trait FrameGrabber extends Serializable {
    def grab(row: MediaRow, frameIdx: Int): Array[Byte]
  }

  /** Deterministic stand-in: treats the payload as `n_frames` equal
    * byte slices and returns slice `frameIdx` — the container-parsing
    * equivalent a real demuxer would do. */
  final class FakeGrabber extends FrameGrabber {
    override def grab(row: MediaRow, frameIdx: Int): Array[Byte] = {
      val n = math.max(row.n_frames, 1)
      val from = (row.payload.length.toLong * frameIdx / n).toInt
      val until = (row.payload.length.toLong * (frameIdx + 1) / n).toInt
      java.util.Arrays.copyOfRange(row.payload, from, until)
    }
  }

  private implicit val frameEnc: Encoder[FrameRow] =
    Encoders.product[FrameRow]

  /** Frame sampling: every `everyN`-th frame of each video row, as a
    * partition-local flatMap (generator shape — one input row fans out
    * to its sampled frames with no shuffle; at 100 TB the fan-out
    * stays inside the task that already holds the payload bytes). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int,
      grabber: FrameGrabber = new FakeGrabber): Dataset[FrameRow] = {
    require(everyN > 0, "everyN must be positive")
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { row =>
        (0 until row.n_frames by everyN).iterator.map { f =>
          FrameRow(row.media_id, f, row.n_frames, grabber.grab(row, f))
        }
      }
    }
  }
}
