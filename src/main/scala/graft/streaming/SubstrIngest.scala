package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming maintenance of the repeated-substring (ExactSubstr)
  * window-hash index: each micro-batch of raw (doc_id, text) rows is
  * audited AT INGEST TIME against the index as of all prior batches —
  * plus its own within-batch repeats — and contributes its new hashes
  * to the index, so duplicated spans are flagged the moment a document
  * arrives, not at the next corpus-wide x129 run.
  *
  * The window frame, hash, and interval-merge audit are the SAME
  * `TextOps.substrWinOf` / `substrAuditOf` definitions the batch x129,
  * the trim x131, and the incremental x134 use — the batch/stream twin
  * discipline applied to the dedup index (StreamingSpec pins per-batch
  * row-identity with the batch-built expectation).
  *
  * Streaming shape: all state lives in the store (the distinct-hash
  * table, one partition per batch until [[compact]] folds them); the
  * stream itself holds nothing. Delete-before-write per batch
  * partition with the history read cut at batch < id makes checkpoint
  * replays idempotent; the Horizon guard refuses replays below a fold.
  */
object SubstrIngest {

  /** Start the ingest-time audit + index-append stream. */
  def start(docs: DataFrame, store: graft.store.Store,
      checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        graft.queries.TextOps.substrIngestBatch(b.sparkSession, b,
          id, store)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Fold the per-batch hash partitions to one (offline maintenance —
    * never under the live stream; a replay below the resulting
    * horizon is refused rather than destroying folded history). */
  def compact(spark: org.apache.spark.sql.SparkSession,
      store: graft.store.Store): Unit =
    graft.queries.TextOps.compactSubstrHashes(spark, store)
}
