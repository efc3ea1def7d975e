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
    // events.parquet has shipped with two physical ts encodings across
    // testdata generations: TIMESTAMP(NANOS) (which the Spark reader
    // rejects by default — read nanos as long, floor to micros, the
    // same truncation DuckDB applies on read) and plain TIMESTAMP(US)
    // (which arrives as TIMESTAMP_NTZ). Normalize BOTH to the session
    // TimestampType so every downstream query sees one ts type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    } else df
  }
}
