package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys follow SURVEY.md §2 operator ids (s*, p*, f*, j*, a*, w*,
  * l*, u*, c*, g*, m*) plus x* for the beyond-parity training-data-pipeline
  * operators and e* for the events/streaming surface.
  */
object SparkEntry {

  /** Full registry: Spark impl + optional DuckDB oracle per query. */
  def all: Map[String, Q] =
    Relational.qs ++ DateOps.qs ++ TextOps.qs ++ VectorOps.qs ++
      EventOps.qs ++ MiscOps.qs ++ MlOps.qs ++ SeqOps.qs ++ TokenOps.qs ++
      SketchOps.qs ++ SelectOps.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
