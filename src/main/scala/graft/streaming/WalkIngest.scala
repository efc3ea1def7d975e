package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.StringToColumn
import graft.queries.VectorOps
import graft.store.Store

/** Streaming walk-corpus ingest — [[GraphIngest]] extended one stage
  * down the embedding pipeline: each micro-batch of raw (vec_id,
  * embedding) rows maintains the k-NN graph
  * ([[graft.queries.VectorOps.appendKnnGraph]]) and then re-walks
  * ONLY the walks the batch invalidated
  * ([[graft.queries.VectorOps.appendWalkCorpus]] — walks visiting a
  * touched cell, plus walks of start nodes the batch introduced).
  * The maintained corpus is bit-identical to a one-shot walk over the
  * final graph (StoreSpec), so a downstream skip-gram trainer
  * ([[graft.queries.VectorOps.trainNodeEmbeddings]]) always consumes
  * exactly the corpus it would have derived from scratch — at
  * touched-cell cost, not corpus cost.
  *
  * Exactly-once through retries rides the batch verbs' idempotency:
  * the graph append is delete-before-write per batch partition, and a
  * replayed walk maintenance pass recomputes the same invalidated
  * sliver to the same bytes (walks are seeded-hash deterministic).
  */
object WalkIngest {

  /** Start the assign→append→re-edge→re-walk stream. `vectors` must
    * provide (vec_id LONG, embedding ARRAY<numeric>); Spark's
    * micro-batch id becomes the graph `batch` partition. */
  def start(vectors: DataFrame, store: Store, checkpoint: String)
      : StreamingQuery =
    startMonitored(vectors, store, checkpoint, monitorDrift = false)

  /** [[start]] plus the embedding-model version monitor: each
    * micro-batch stamps which `node_embeddings` version is serving
    * ([[DriftMonitor]]); an out-of-band retrain
    * ([[graft.queries.VectorOps.trainStoredEmbeddings]]) then shows up
    * as a `embed_version_drift` report on the next batch — the batch
    * drift verb running continuously, for free, on the ingest clock. */
  def startMonitored(vectors: DataFrame, store: Store,
      checkpoint: String, monitorDrift: Boolean = true, k: Int = 5,
      queryNodes: Seq[Long] = 0L until 8L): StreamingQuery =
    vectors
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        VectorOps.appendKnnGraph(b.sparkSession,
          VectorOps.normalized(b), id, store)
        VectorOps.appendWalkCorpus(b.sparkSession, store, id)
        if (monitorDrift)
          DriftMonitor.embedStampAndDrift(b.sparkSession, store, id,
            k, queryNodes)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
