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
}
