package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.StringToColumn
import graft.queries.VectorOps
import graft.store.Store

/** Streaming ANN-corpus ingest — the incremental ANN lifecycle
  * ([[graft.queries.VectorOps.appendAnnCorpus]]) driven by Structured
  * Streaming: each micro-batch of raw (vec_id, embedding) rows is
  * normalized, encoded (coarse cell + 8 PQ codes) against the
  * PERSISTED trained books, and landed under its own `batch` partition
  * with delete-before-write — so a replayed micro-batch overwrites
  * itself and the sink stays exactly-once through retries, the same
  * idempotency contract as the reference's delete-before-write sinks
  * (ref: blackmagic/data/ceph.py:250-333).
  *
  * Scale shape mirrors the batch path exactly (it IS the batch path,
  * per micro-batch): the corpus-side work for a day's ingest is one
  * codegen projection over that day's rows — history is never
  * re-encoded, re-scanned, or shuffled — and the trained books load as
  * two bounded parquet collects (16×64 + 8×16×8 doubles). Searches
  * over the accumulating corpus go through
  * [[graft.queries.VectorOps.annIvfPqSearchStored]], which reads codes
  * straight off parquet.
  */
object AnnIngest {

  /** Start the encode-and-append stream. `vectors` must provide
    * (vec_id LONG, embedding ARRAY<numeric>); Spark's micro-batch id
    * becomes the corpus `batch` partition. */
  def start(vectors: DataFrame, store: Store, checkpoint: String)
      : StreamingQuery =
    vectors
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        VectorOps.appendAnnCorpus(b.sparkSession,
          VectorOps.normalized(b), id, store)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  // NOTE: there is deliberately no `startMonitored` here. An ANN-book
  // version flip cannot happen on an ingest store: a book retrain
  // under a populated, PQ-coded `ann_corpus` REFUSES (the desync
  // guard — the codes carry no raw vectors to re-encode), and this
  // stream is exactly what populates that corpus. Monitoring book
  // versions belongs on the stores where retrains are legal —
  // [[DriftMonitor.annMonitor]] runs there on its own clock.
}
