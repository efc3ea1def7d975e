package graft.store

import org.apache.spark.sql.SparkSession

/** Persisted lifecycle horizon for a maintained index family.
  *
  * Compaction (and cell rebalance) physically destroy superseded
  * history, so each family records the batch id its history was folded
  * up to in a tiny one-row `<base>_horizon` entity. Two consumers:
  *
  *  - the APPEND guard: a writer asked to (re)ingest a batch id at or
  *    below the horizon must fail loudly — that batch id's partition
  *    was folded away, and the delete-before-write idempotency replay
  *    (`store.delete(batch -> id)`) would otherwise silently destroy
  *    every other row folded into the consolidated partition;
  *  - as-of (snapshot) reads, which refuse to serve history below the
  *    horizon rather than present compacted state under an old batch
  *    id.
  *
  * The horizon only advances (set() keeps the max), so a re-run of an
  * older maintenance job cannot narrow the guard.
  */
object Horizon {
  private def entityOf(base: String) = s"${base}_horizon"

  /** Advance the persisted horizon to `batch` (monotone: an older
    * value never replaces a newer one). Whole-entity overwrite of a
    * one-row frame — negligible at any scale. */
  def set(store: Store, s: SparkSession, base: String,
      batch: Long): Unit = {
    val h = math.max(batch, get(store, s, base).getOrElse(Long.MinValue))
    store.write(entityOf(base),
      s.createDataFrame(Seq(Tuple1(h))).toDF("horizon"), Seq.empty)
  }

  /** The persisted horizon, if any maintenance job ever folded this
    * family. Only entity-absent (AnalysisException) means "no horizon";
    * a FAILING read propagates — swallowing it would let an append
    * replay destroy folded history. */
  def get(store: Store, s: SparkSession, base: String): Option[Long] =
    try {
      import org.apache.spark.sql.functions.{col, max}
      val r = store.read(entityOf(base), s)
        .agg(max(col("horizon").cast("long"))).first()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Loud append guard (see class doc). */
  def requireAppendable(store: Store, s: SparkSession, base: String,
      batchId: Long): Unit =
    get(store, s, base).foreach(h => require(batchId > h,
      s"append batch $batchId is at or below the $base compaction " +
        s"horizon $h: that batch id's history was folded into a " +
        "consolidated partition, and the delete-before-write replay " +
        "would silently destroy every other row folded with it — " +
        "ingest under a fresh batch id above the horizon"))
}
