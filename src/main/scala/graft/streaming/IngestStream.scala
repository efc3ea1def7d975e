package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.StringToColumn
import graft.functions.{TextExprs => T}

/** Streaming training-data ingest — the BASELINE "Structured Streaming
  * ingestion" path as one composed pipeline: quality scoring -> gate ->
  * content fingerprint -> exact dedup -> idempotent keyed sink. Every
  * stage is the streaming form of an oracle-checked batch operator
  * (x2 quality metrics, x4 fingerprint, x5 exact dedup), built from
  * the same column expressions, so batch and stream can't drift.
  *
  * Scale shape: scoring/gating/fingerprinting are stateless codegen'd
  * projections (no shuffle, no state); the only stateful operator is
  * the dedup, whose state is bounded by the watermark horizon — at
  * 100 TB/day the store holds one horizon's content keys, not the
  * stream's history. The sink appends via the exactly-once file-sink
  * protocol (or any [[graft.store.Connector]] through foreachBatch).
  */
object IngestStream {

  /** Acceptance gates (the x2/x27 filter pipeline, streaming form). */
  final case class Gates(
      minTokens: Int = 5,
      minAlphaRatio: Double = 0.4,
      maxStopRatio: Double = 0.8)

  /** Transform a streaming (doc_id, ts, text) frame into the gated,
    * deduplicated, quality-annotated training stream. */
  def ingest(docs: DataFrame, gates: Gates = Gates(),
      watermark: String = "10 minutes"): DataFrame = {
    val tk = T.wsTokens(lower($"text"))
    val scored = docs
      .withColumn("tk", tk)
      .withColumn("n_tokens", size($"tk").cast("long"))
      .withColumn("stop_ratio",
        size(filter($"tk", w =>
          w.isin(graft.queries.TextOps.Stopwords: _*))).cast("double") /
          greatest($"n_tokens", lit(1L)))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower($"text"), "[^a-z]", "")).cast("double") /
          greatest(length($"text"), lit(1)))
      .withColumn("content_key", T.md5Long($"text"))
      .drop("tk")
    scored
      .filter($"n_tokens" >= gates.minTokens &&
        $"alpha_ratio" >= gates.minAlphaRatio &&
        $"stop_ratio" <= gates.maxStopRatio)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_key")
  }

  /** Start the ingest into the exactly-once parquet file sink. */
  def start(docs: DataFrame, path: String, checkpoint: String,
      gates: Gates = Gates(), watermark: String = "10 minutes")
      : StreamingQuery =
    ingest(docs, gates, watermark).writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
