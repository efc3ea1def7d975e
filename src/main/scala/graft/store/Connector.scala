package graft.store

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable external-storage transport — the seam that makes the
  * BASELINE "Cassandra sink" swap a configuration change, not code.
  * Mirrors the reference's pluggable Storage contract (ref:
  * blackmagic/data/__init__.py:13-70): lifecycle + per-PARTITION
  * keyed select/upsert/delete ("each operation is assumed to be
  * working at that partition level rather than an individual data
  * point").
  *
  * A production implementation (Cassandra, a JDBC store, an object
  * store) writes partition-wise from executors via
  * `df.foreachPartition`; the in-memory fake below materializes rows
  * on the driver, which is exactly what a unit-test transport should
  * do and nothing a pipeline should.
  */
trait Connector extends Serializable {
  def setup(): Unit = ()
  def start(): Unit = ()
  def stop(): Unit = ()

  /** Delete+insert every key-partition present in `df` (the reference's
    * delete-before-write idempotency, ceph.py:250-333). Partitions of
    * OTHER keys must survive. */
  def upsert(entity: String, df: DataFrame, keys: Seq[String]): Unit

  /** Drop one key-partition; idempotent when absent. */
  def delete(entity: String, keyValues: Seq[(String, Any)]): Unit

  def select(entity: String, spark: SparkSession): DataFrame
}

/** Driver-local transport fake for specs and small runs: rows grouped
  * by key tuple per entity, guarded by the object monitor. Bounded by
  * construction — only control-plane-sized entities (models, per-chip
  * partitions under test) ever flow through it. */
final class InMemoryConnector extends Connector {

  private case class Entity(schema: StructType, keys: Seq[String],
      parts: Map[Seq[Any], Seq[Row]])
  private val entities =
    scala.collection.mutable.Map.empty[String, Entity]

  override def upsert(entity: String, df: DataFrame,
      keys: Seq[String]): Unit = {
    val rows = df.collect() // test transport: bounded by the caller
    val schema = df.schema
    val grouped = rows.toSeq.groupBy(r => keys.map(k => r.get(r.fieldIndex(k))))
    synchronized {
      val cur = entities.get(entity)
        .map(_.parts).getOrElse(Map.empty[Seq[Any], Seq[Row]])
      entities(entity) = Entity(schema, keys, cur ++ grouped)
    }
  }

  override def delete(entity: String,
      keyValues: Seq[(String, Any)]): Unit = synchronized {
    entities.get(entity).foreach { e =>
      // match on the entity's key order regardless of argument order
      val want = e.keys.map(k =>
        keyValues.collectFirst { case (`k`, v) => v }.orNull)
      entities(entity) = e.copy(parts = e.parts - want)
    }
  }

  override def select(entity: String, spark: SparkSession): DataFrame =
    synchronized {
      val e = entities.getOrElse(entity,
        throw new IllegalArgumentException(s"no such entity: $entity"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        e.parts.values.flatten.toSeq.asJava, e.schema)
    }
}

/** [[Store]] adapter over a [[Connector]]: pipelines keep their one
  * storage seam, and which backend receives the writes is decided by
  * the connector instance handed in — config, not code. */
final class ConnectorStore(val connector: Connector) extends Store {
  connector.setup(); connector.start()

  override def write(entity: String, df: DataFrame,
      keys: Seq[String]): Unit = connector.upsert(entity, df, keys)

  override def read(entity: String, spark: SparkSession): DataFrame =
    connector.select(entity, spark)

  override def delete(entity: String,
      keyValues: Seq[(String, Any)]): Unit =
    connector.delete(entity, keyValues)
}

/** The reference Storage interface, method for method (ref:
  * blackmagic/data/__init__.py:13-70): select/insert/delete per entity
  * plus lifecycle, expressed over any [[Store]]. Entity key columns
  * follow the reference's addressing: tiles by (tx, ty), everything
  * else by chip (cx, cy).
  */
final class KeyedApi(store: Store, spark: SparkSession) {

  private def sel(entity: String, k1: String, v1: Long, k2: String,
      v2: Long): DataFrame =
    store.readKeyed(entity, Seq(k1 -> v1, k2 -> v2), spark)

  def setup(): Unit = store match {
    case c: ConnectorStore => c.connector.setup(); case _ => ()
  }
  def start(): Unit = store match {
    case c: ConnectorStore => c.connector.start(); case _ => ()
  }
  def stop(): Unit = store match {
    case c: ConnectorStore => c.connector.stop(); case _ => ()
  }

  def selectTile(tx: Long, ty: Long): DataFrame = sel("tile", "tx", tx, "ty", ty)
  def selectChip(cx: Long, cy: Long): DataFrame = sel("chip", "cx", cx, "cy", cy)
  def selectPixels(cx: Long, cy: Long): DataFrame = sel("pixel", "cx", cx, "cy", cy)
  def selectSegments(cx: Long, cy: Long): DataFrame = sel("segment", "cx", cx, "cy", cy)
  def selectPredictions(cx: Long, cy: Long): DataFrame = sel("prediction", "cx", cx, "cy", cy)

  def insertTile(df: DataFrame): Unit = store.write("tile", df, Seq("tx", "ty"))
  def insertChip(df: DataFrame): Unit = store.write("chip", df, Seq("cx", "cy"))
  def insertPixels(df: DataFrame): Unit = store.write("pixel", df, Seq("cx", "cy"))
  def insertSegments(df: DataFrame): Unit = store.write("segment", df, Seq("cx", "cy"))
  def insertPredictions(df: DataFrame): Unit = store.write("prediction", df, Seq("cx", "cy"))

  def deleteTile(tx: Long, ty: Long): Unit =
    store.delete("tile", Seq("tx" -> tx, "ty" -> ty))
  def deleteChip(cx: Long, cy: Long): Unit =
    store.delete("chip", Seq("cx" -> cx, "cy" -> cy))
  def deletePixels(cx: Long, cy: Long): Unit =
    store.delete("pixel", Seq("cx" -> cx, "cy" -> cy))
  def deleteSegments(cx: Long, cy: Long): Unit =
    store.delete("segment", Seq("cx" -> cx, "cy" -> cy))
  def deletePredictions(cx: Long, cy: Long): Unit =
    store.delete("prediction", Seq("cx" -> cx, "cy" -> cy))
}
