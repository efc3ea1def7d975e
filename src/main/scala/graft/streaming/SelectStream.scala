package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming maintenance of the DSIR importance-resampling model: the
  * per-bucket (target, raw-pool) token counts kept incrementally fresh
  * as documents stream in. The per-bucket log-ratio λ — and hence
  * every document's importance weight — derives from this table alone,
  * so keeping IT live is keeping the whole selection model live: the
  * same "maintain the model's sufficient statistics, not the scored
  * corpus" economy as the BM25 index twin (SparseIndexStream) and the
  * CMS twin (SketchStream).
  *
  * The definition is SHARED with the batch query
  * (`SelectOps.dsirCounts`, the same frame x73 consumes), so a
  * streamed model is bit-identical to a batch rebuild over the same
  * documents. Streaming shape: a pure streaming aggregation whose
  * state IS the B-row bucket table — bounded regardless of stream
  * length, no watermark; each micro-batch folds its token counts in
  * map-side before touching state. Complete mode exposes the live
  * model (B rows — trivially re-emittable to a scorer's broadcast).
  */
object SelectStream {

  /** Incremental DSIR bucket counts of a streaming documents frame
    * (needs `doc_id`, `text`). */
  def dsirCounts(docs: DataFrame): DataFrame =
    graft.queries.SelectOps.dsirCounts(docs)
}
