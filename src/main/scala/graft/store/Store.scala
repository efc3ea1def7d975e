package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed entity storage (SURVEY.md §2.1 S6–S13). The reference stores one
  * gzipped JSON array per chip/tile key on S3 and deletes-before-writes
  * for idempotent re-runs (ref: blackmagic/data/ceph.py:250-333,338-351).
  *
  * Spark-first mapping: partitioned parquet with DYNAMIC partition
  * overwrite — rewriting a chip's partition atomically subsumes the
  * reference's delete+insert (S12), and (cx, cy) partition columns give
  * the same key-addressed reads via partition pruning that the
  * reference's key scheme hand-implements.
  *
  * At 100 TB: one partition per chip key ≈ the reference's object layout;
  * writers `repartition(keys)` first so each task writes exactly one
  * partition file instead of shuffling small files across tasks.
  */
trait Store extends Serializable {
  def write(entity: String, df: DataFrame, keys: Seq[String]): Unit
  def read(entity: String, spark: SparkSession): DataFrame
}

final class ParquetStore(root: String) extends Store {
  import org.apache.spark.sql.functions.col

  override def write(entity: String, df: DataFrame, keys: Seq[String]): Unit =
    df.repartition(keys.map(col): _*)
      .write
      .partitionBy(keys: _*)
      .option("partitionOverwriteMode", "dynamic") // S12: overwrite == delete+insert
      .mode("overwrite")
      .parquet(s"$root/$entity")

  override def read(entity: String, spark: SparkSession): DataFrame =
    spark.read.parquet(s"$root/$entity")
}

/** Bucketed variant: rows are hash-bucketed (and sorted) on the key
  * columns at write time, so two entities written with the same keys
  * and bucket count join WITHOUT a shuffle — the physical layout
  * carries the partitioning. This is the 100 TB answer to the
  * segments ⋈ aux join (J1): at tile scale neither side broadcasts,
  * and bucketing both tables on (cx, cy, px, py) makes the repeated
  * train/predict joins exchange-free forever after one write.
  *
  * Bucketed output requires the table catalog (`saveAsTable`); the
  * data itself lands as ordinary parquet under `root/entity`.
  */
final class BucketedStore(root: String, buckets: Int) extends Store {

  private def table(entity: String) = s"graft_bkt_$entity"

  override def write(entity: String, df: DataFrame, keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", s"$root/$entity")
      .mode("overwrite")
      .saveAsTable(table(entity))

  override def read(entity: String, spark: SparkSession): DataFrame =
    spark.table(table(entity))
}

/** Gzipped-JSON variant mirroring the reference's storage codec
  * byte-for-byte in spirit (one gzip JSON object set per key partition,
  * ceph.py:297-333); parquet remains the performance default — this
  * exists for interop with consumers of the reference's layout.
  */
final class JsonStore(root: String) extends Store {
  import org.apache.spark.sql.functions.col

  override def write(entity: String, df: DataFrame, keys: Seq[String]): Unit =
    df.repartition(keys.map(col): _*)
      .write
      .partitionBy(keys: _*)
      .option("compression", "gzip")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .json(s"$root/$entity")

  override def read(entity: String, spark: SparkSession): DataFrame =
    spark.read.json(s"$root/$entity")
}
