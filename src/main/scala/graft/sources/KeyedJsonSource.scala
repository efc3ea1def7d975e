package graft.sources

import java.io.{BufferedReader, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader over the keyed gzip-JSON layout `JsonStore`
  * writes (`cx=<v>/cy=<v>/part-*.json[.gz]`) — the Spark-native form of
  * the reference's key-addressed object GETs
  * (`blackmagic/data/ceph.py:265-305`: one S3 object per chip key).
  *
  * Schema: `(cx long, cy long, value string)` — one row per JSON line,
  * payload left as text for `from_json` downstream (C7).
  *
  * Scale behavior, asserted in `KeyedSourceSpec`:
  *  - '''Key-filter pruning''': EqualTo / In / comparison filters on
  *    `cx`/`cy` are applied to the DIRECTORY listing — non-matching
  *    keys are never opened, exactly like the reference fetching only
  *    the requested chip's object. One `InputPartition` per surviving
  *    file.
  *  - '''Column pruning''': the reader materializes only the requested
  *    columns (a `value`-less count never decodes payloads).
  *  - All filters are also returned as residuals, so Spark re-evaluates
  *    them post-scan — pruning can only skip, never change results.
  *
  * Usage: `spark.read.format("graft-keyed").load(dir)`.
  */
class KeyedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedJsonSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KeyedJsonTable(properties.get("path"))
}

object KeyedJsonSource {
  val Schema: StructType = StructType(Seq(
    StructField("cx", LongType, nullable = false),
    StructField("cy", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Evaluate a pushed filter against a key pair (driver-side pruning).
    * Unsupported filters prune nothing (conservative). */
  def keep(f: Filter, cx: Long, cy: Long): Boolean = {
    def v(attr: String): Option[Long] = attr.toLowerCase match {
      case "cx" => Some(cx)
      case "cy" => Some(cy)
      case _ => None
    }
    def lng(a: Any): Option[Long] = a match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    f match {
      case EqualTo(a, x) =>
        (for (k <- v(a); c <- lng(x)) yield k == c).getOrElse(true)
      case In(a, xs) =>
        v(a).forall(k => xs.flatMap(lng).contains(k))
      case GreaterThan(a, x) =>
        (for (k <- v(a); c <- lng(x)) yield k > c).getOrElse(true)
      case GreaterThanOrEqual(a, x) =>
        (for (k <- v(a); c <- lng(x)) yield k >= c).getOrElse(true)
      case LessThan(a, x) =>
        (for (k <- v(a); c <- lng(x)) yield k < c).getOrElse(true)
      case LessThanOrEqual(a, x) =>
        (for (k <- v(a); c <- lng(x)) yield k <= c).getOrElse(true)
      case And(l, r) => keep(l, cx, cy) && keep(r, cx, cy)
      case Or(l, r) => keep(l, cx, cy) || keep(r, cx, cy)
      case _ => true
    }
  }

  /** Whether pruning can use this filter at all (for pushedFilters
    * reporting in the plan). */
  def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => isKey(a)
    case In(a, _) => isKey(a)
    case GreaterThan(a, _) => isKey(a)
    case GreaterThanOrEqual(a, _) => isKey(a)
    case LessThan(a, _) => isKey(a)
    case LessThanOrEqual(a, _) => isKey(a)
    case And(l, r) => prunable(l) || prunable(r)
    case Or(l, r) => prunable(l) && prunable(r)
    case _ => false
  }
  private def isKey(a: String) =
    a.equalsIgnoreCase("cx") || a.equalsIgnoreCase("cy")
}

final class KeyedJsonTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-keyed:$path"
  override def schema(): StructType = KeyedJsonSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedJsonScanBuilder(path)
}

final class KeyedJsonScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pruning: Array[Filter] = Array.empty
  private var required: StructType = KeyedJsonSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pruning = filters.filter(KeyedJsonSource.prunable)
    filters // everything stays a residual: pruning only ever skips files
  }
  override def pushedFilters(): Array[Filter] = pruning

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = KeyedJsonScan(path, pruning, required)
}

final case class KeyedFilePartition(cx: Long, cy: Long, file: String)
  extends InputPartition

final case class KeyedJsonScan(path: String, pruning: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keyed path=$path, PrunedBy: ${pruning.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) return Array.empty
    def keyDirs(p: Path, prefix: String): Seq[(Long, Path)] =
      Files.list(p).iterator.asScala.toSeq
        .filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith(prefix))
        .flatMap { d =>
          d.getFileName.toString.stripPrefix(prefix).toLongOption.map(_ -> d)
        }
    for {
      (cx, cxDir) <- keyDirs(root, "cx=").toArray
      (cy, cyDir) <- keyDirs(cxDir, "cy=")
      if pruning.forall(KeyedJsonSource.keep(_, cx, cy))
      f <- Files.list(cyDir).iterator.asScala
      name = f.getFileName.toString
      if name.endsWith(".json") || name.endsWith(".json.gz")
    } yield KeyedFilePartition(cx, cy, f.toString): InputPartition
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedJsonReaderFactory(required.fieldNames)
}

final class KeyedJsonReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeyedFilePartition]
    new PartitionReader[InternalRow] {
      private val in = {
        val fis = new FileInputStream(p.file)
        val stream =
          if (p.file.endsWith(".gz")) new GZIPInputStream(fis) else fis
        new BufferedReader(
          new InputStreamReader(stream, StandardCharsets.UTF_8))
      }
      private var line: String = _

      override def next(): Boolean = {
        line = in.readLine()
        while (line != null && line.isEmpty) line = in.readLine()
        line != null
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "cx" => p.cx
          case "cy" => p.cy
          case "value" => UTF8String.fromString(line)
        })

      override def close(): Unit = in.close()
    }
  }
}
