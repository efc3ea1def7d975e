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

  /** Optional decontamination stage: a bloom of reference (benchmark)
    * keys, probed per document on the PrefK-token prefix key — the
    * streaming twin of batch `x31_decontam_bloom`. The filter is a
    * stateless codegen projection (the bit array rides the task
    * closure), so it adds zero state and zero shuffle to the stream.
    * Streams trade the batch path's exact confirm join for the bloom's
    * fp rate (~0.24% at 16 bits/key): a false positive drops a clean
    * doc, never admits a contaminated one — the safe direction for
    * training data. Build the bits once per reference-list version
    * with [[contaminationBloom]].
    */
  final case class Decontam(bits: Array[Long], prefK: Int = 4)

  /** Build the decontamination bloom from a batch frame of reference
    * texts (one distributed aggregate over the SMALL side). */
  def contaminationBloom(refTexts: DataFrame, prefK: Int = 4)
      : Array[Long] = {
    val key = array_join(slice(T.wsTokens(col("text")), 1, prefK), " ")
    val ref = refTexts.select(key.as("p")).distinct()
    ref.select(graft.functions.Bloom.agg(
        graft.functions.Bloom.wordsFor(ref.count()))(T.md5Long(col("p"))))
      .head().getSeq[Long](0).toArray
  }

  /** Transform a streaming (doc_id, ts, text) frame into the gated,
    * deduplicated, quality-annotated training stream. */
  def ingest(docs: DataFrame, gates: Gates = Gates(),
      watermark: String = "10 minutes",
      decontam: Option[Decontam] = None): DataFrame = {
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
    val gated = scored
      .filter($"n_tokens" >= gates.minTokens &&
        $"alpha_ratio" >= gates.minAlphaRatio &&
        $"stop_ratio" <= gates.maxStopRatio)
    val cleaned = decontam.fold(gated) { d =>
      gated.filter(!graft.functions.Bloom.mightContain(d.bits,
        T.md5Long(array_join(slice(T.wsTokens($"text"), 1, d.prefK), " "))))
    }
    cleaned
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
