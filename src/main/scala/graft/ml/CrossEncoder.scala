package graft.ml

import java.nio.ByteBuffer

/** Batched pair-reranking scorer seam — the cross-encoder stage of a
  * modern retrieval pipeline (retrieve a cheap top-N shortlist, then
  * rerank each (query, doc) pair with an expensive pairwise model).
  * The Spark-side contract mirrors M3's hard-won batch-scoring lesson
  * (PredictionPipeline: broadcast model bytes + whole-partition
  * batched scoring via mapPartitions — never a per-row UDF, ref:
  * blackmagic/blueprints/prediction.py:199-231's 970 s/chip per-row
  * failure): the engine hands the scorer one BATCH of feature rows
  * and takes a batch of scores back, exactly the tensor-per-batch
  * shape a real ONNX/TF session wants.
  *
  * The model is a LINEAR stand-in with its weights carried in the
  * model bytes (this environment ships no inference runtime — the
  * same honesty rule as the multimodal decode seams): deterministic
  * integer arithmetic, so the x110 oracle replays scoring exactly. A
  * real cross-encoder swaps the bytes and this object; the pipeline
  * plumbing — shortlist join, feature assembly, model broadcast,
  * batching, rank — is the production shape either way.
  */
object CrossEncoder {

  /** Serialize integer weights as the model artifact. */
  def model(weights: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(weights.length * 8)
    weights.foreach(bb.putLong)
    bb.array()
  }

  def weightsOf(model: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(model)
    Array.fill(model.length / 8)(bb.getLong())
  }

  /** Score one batch: dot(weights, features) per row, exact longs.
    * Overflow-checked (Math.multiplyExact/addExact): a pathological
    * weight/feature combination fails loudly like the engine's other
    * exact-integer paths instead of silently wrapping away from the
    * oracle's unwrapped BIGINT arithmetic. */
  def scoreBatch(model: Array[Byte], batch: Iterator[Array[Long]])
      : Iterator[Long] = {
    val w = weightsOf(model)
    batch.map { f =>
      require(f.length == w.length,
        s"feature width ${f.length} != model width ${w.length}")
      var s = 0L
      var i = 0
      while (i < w.length) {
        s = Math.addExact(s, Math.multiplyExact(w(i), f(i))); i += 1
      }
      s
    }
  }
}
