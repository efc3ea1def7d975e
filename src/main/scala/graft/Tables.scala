package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loader for the driver-provided testdata tables (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst's filter pushdown and column
  * pruning reach the file scan (SURVEY.md §2.1 S1–S5: the reference's
  * key-addressed reads map to partition pruning / pushed filters here).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan + explicit fan-out. The driver testdata is one parquet file
    * with ONE row group per table, so a plain scan is a single task and
    * all narrow per-row compute (tokenize/shingle/hash/normalize)
    * serializes on one core until the first shuffle. The repartition
    * stands in for the thousands of file splits a real 100 TB table
    * gives the scan for free — compute-heavy queries read through this.
    */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name).repartition(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which the Spark reader
    // rejects by default; read nanos as long and floor to micros (the
    // same truncation DuckDB applies on read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
