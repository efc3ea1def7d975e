package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew guard: two-stage salted aggregation (SURVEY §4 /
  * BASELINE "salting for skew"). For additive aggregates over a key
  * whose value distribution is pathological (one key owning most rows),
  * stage 1 aggregates on (key, salt) — spreading each hot key over
  * `salts` reducers — and stage 2 folds the partials per key. AQE's
  * skew-join splitting covers joins; this covers aggregations whose
  * single hot key would otherwise serialize one reducer at 100 TB.
  */
object Skew {

  /** Salted sum+count of `value` grouped by `keys`. The salt is a hash
    * of the whole row tuple mod `salts` — deterministic, no RNG, so
    * re-runs and task retries agree. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: String,
      salts: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val salt = pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts))
      .as("_salt")
    df.select((keyCols :+ salt :+ col(value).as("_v")): _*)
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(col("_v")).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n_rows"))
  }

  /** Salted equi-join for a skewed big side: the big side gets a
    * deterministic row-hash salt, the other side is replicated across
    * all `salts` values, and the join key becomes (key, salt) — each
    * hot key spreads over `salts` reducers instead of serializing one.
    * This is the manual big-big skew-join guard; when the small side
    * fits the broadcast threshold Spark needs no salt at all, and AQE
    * skew splitting covers moderate skew — use this when BOTH sides
    * are too big to broadcast and one key dominates. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
