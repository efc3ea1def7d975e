package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Column names MUST match between the two (the driver sorts
  * columns by name before hashing).
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** queries included in the headline bench set */
    bench: Boolean = false)

object Q {
  def apply(oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(run, Some(oracle))
  def noOracle(run: (SparkSession, String) => DataFrame): Q =
    Q(run, None)
}
