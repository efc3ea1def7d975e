package graft.sources

import java.io.{BufferedReader, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
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
  *  - '''Residual discipline''': key-only predicates are decided
  *    EXACTLY by the listing (all rows in a file share its key pair),
  *    so they are fully handled at the scan; everything else returns
  *    as a residual for Spark to re-evaluate — pruning can only skip,
  *    never change results.
  *  - '''Aggregate pushdown''': COUNT(*) / COUNT(col) grouped by key
  *    columns collapses the scan to one pre-aggregated row per file
  *    (line count, no JSON decode); Spark's final aggregate merges the
  *    partials, and the exact residual discipline above is what lets
  *    the aggregation sink below key filters.
  *
  * Usage: `spark.read.format("graft-keyed").load(dir)`.
  */
class KeyedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedJsonSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // Spark stores zero paths as a missing "path" property and several
    // paths under "paths" — both would surface here as a null that NPEs
    // deep inside planInputPartitions; name the problem instead
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-keyed requires exactly one load path: " +
        "spark.read.format(\"graft-keyed\").load(dir)")
    new KeyedJsonTable(path)
  }
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

  /** The single-field KEY column (cx/cy) a V2 expression references,
    * lower-cased — ONE definition for every pushdown eligibility test
    * (top-N ordering, aggregate grouping, key min/max). */
  private[sources] def keyRef(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 &&
      isKey(f.fieldNames()(0)) =>
      Some(f.fieldNames()(0).toLowerCase)
    case _ => None
  }

  /** Any single-field SCHEMA column a V2 expression references —
    * COUNT(col) may only push when col is a PLAIN column reference
    * (all schema columns are non-nullable, so it equals COUNT(*));
    * a computed expression like COUNT(CAST(value AS INT)) can yield
    * nulls and must stay in Spark. */
  private[sources] def colRef(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 &&
      Schema.fieldNames.exists(_.equalsIgnoreCase(f.fieldNames()(0))) =>
      Some(f.fieldNames()(0).toLowerCase)
    case _ => None
  }

  /** A pushed aggregate op: a per-file line count, or a key-column
    * min/max — a key is constant across its file, so per-file min and
    * max are BOTH just the file's key value, answerable from the
    * directory listing with zero file I/O (one case serves Min and
    * Max). */
  sealed trait PushedAgg extends Serializable
  case object PushedCount extends PushedAgg
  final case class PushedKeyValue(key: String) extends PushedAgg

  /** Whether directory pruning evaluates this filter EXACTLY (every row
    * in a file shares the file's key pair, so a key-only predicate
    * decided at the listing needs no post-scan re-evaluation). Only
    * such filters may be dropped from the residual set — and only when
    * every comparison value is a number the pruner can read. */
  def exactlyHandled(f: Filter): Boolean = {
    def num(a: Any): Boolean = a.isInstanceOf[Number]
    f match {
      case EqualTo(a, x) => isKey(a) && num(x)
      case In(a, xs) => isKey(a) && xs.forall(num)
      case GreaterThan(a, x) => isKey(a) && num(x)
      case GreaterThanOrEqual(a, x) => isKey(a) && num(x)
      case LessThan(a, x) => isKey(a) && num(x)
      case LessThanOrEqual(a, x) => isKey(a) && num(x)
      case And(l, r) => exactlyHandled(l) && exactlyHandled(r)
      case Or(l, r) => exactlyHandled(l) && exactlyHandled(r)
      case _ => false
    }
  }
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var pruning: Array[Filter] = Array.empty
  private var required: StructType = KeyedJsonSource.Schema
  private var aggGroupKeys: Option[Seq[String]] = None
  private var rowCap: Option[Int] = None

  /** LIMIT pushdown (partial): every reader stops after `limit` rows —
    * for a gzip object that means the stream stops DECOMPRESSING at
    * the cap instead of draining the file. Partial because files are
    * independent readers (Spark keeps its own global Limit). */
  override def pushLimit(limit: Int): Boolean = {
    rowCap = Some(limit)
    true
  }

  /** Top-N pushdown (partial), accepted only when every sort key is a
    * KEY column: a key is constant across its file, so all of a
    * file's rows tie under the ordering and ANY `limit` of them can
    * represent the file in the global top-N — each reader caps at
    * `limit` rows and Spark's final TakeOrdered works on ≤ limit·files
    * pre-bounded rows instead of the full corpus. An ordering that
    * touches the payload can't be bounded per file → not pushed. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    val keysOnly =
      orders.forall(o => KeyedJsonSource.keyRef(o.expression()).isDefined)
    if (keysOnly) { rowCap = Some(limit); true } else false
  }

  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pruning = filters.filter(KeyedJsonSource.prunable)
    // key-only predicates are decided EXACTLY at the directory listing
    // (all rows in a file share its key pair) — dropping them from the
    // residual set is what lets Spark push an aggregation below them;
    // everything else stays a residual so pruning can only skip,
    // never change results
    filters.filterNot(KeyedJsonSource.exactlyHandled)
  }
  override def pushedFilters(): Array[Filter] = pruning

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) (and COUNT(col) over this source's non-nullable
    * columns), plus MIN/MAX over the KEY columns, grouped by any
    * subset of the key columns, push down: the reader then emits ONE
    * pre-aggregated row per file and Spark's final aggregate merges
    * the partials (partial pushdown: `supportCompletePushDown` stays
    * false, one file per (cx, cy) is not guaranteed). Counts are a
    * line scan with no row materialization — parquet's metadata-count
    * shape over the keyed JSON layout; key min/max are answered from
    * the directory LISTING alone (a key is constant across its file),
    * so a min/max-only query never opens a single file. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    import KeyedJsonSource.{colRef, keyRef}
    val keysOk =
      aggregation.groupByExpressions.forall(e => keyRef(e).isDefined)
    val ops = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(KeyedJsonSource.PushedCount)
      // COUNT over a PLAIN column reference only: every schema column
      // is non-nullable, so that equals COUNT(*); a computed argument
      // (COUNT(CAST(value AS INT))) can produce nulls SQL must skip —
      // answering it with a line count would silently overcount
      case c: Count if !c.isDistinct && colRef(c.column).isDefined =>
        Some(KeyedJsonSource.PushedCount)
      case m: Min => keyRef(m.column).map(KeyedJsonSource.PushedKeyValue)
      case m: Max => keyRef(m.column).map(KeyedJsonSource.PushedKeyValue)
      case _ => None
    }
    if (keysOk && ops.nonEmpty && ops.forall(_.isDefined)) {
      aggGroupKeys = Some(aggregation.groupByExpressions.toSeq.map {
        case f: NamedReference => f.fieldNames()(0).toLowerCase
      })
      aggOps = ops.flatten
      true
    } else false
  }
  private var aggOps: Seq[KeyedJsonSource.PushedAgg] = Seq.empty

  // scans carry Seq[Filter] (not Array): case-class equality on an
  // Array is reference identity, which would defeat Spark's
  // exchange/scan reuse for identical scans (a self-join would list
  // and decompress every file twice)
  override def build(): Scan = aggGroupKeys match {
    case Some(keys) =>
      KeyedJsonCountScan(path, pruning.toSeq, keys, aggOps)
    case None => KeyedJsonScan(path, pruning.toSeq, required, rowCap)
  }
}

/** Pre-aggregated scan: one row per surviving file, carrying the
  * file's key columns and, per pushed op, its (non-empty) line count
  * or the file's key value (serving MIN and MAX at once) — no JSON
  * decode, no per-row materialization, and when no count is requested
  * the file is never even opened. Spark's final aggregate merges the
  * partials. */
final case class KeyedJsonCountScan(path: String, pruning: Seq[Filter],
    groupKeys: Seq[String], ops: Seq[KeyedJsonSource.PushedAgg])
  extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    groupKeys.map(k => StructField(k, LongType, nullable = false)) ++
      ops.zipWithIndex.map { case (_, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      })

  override def toBatch: Batch = this
  override def description(): String = {
    val shown = ops.map {
      case KeyedJsonSource.PushedCount => "COUNT(*)"
      case KeyedJsonSource.PushedKeyValue(k) => s"MINMAX($k)"
    }.mkString(", ")
    s"graft-keyed path=$path, PrunedBy: ${pruning.mkString("[", ", ", "]")}" +
      s", PushedAggregation: [$shown group by ${groupKeys.mkString(",")}]"
  }

  override def planInputPartitions(): Array[InputPartition] =
    KeyedJsonScan(path, pruning, KeyedJsonSource.Schema)
      .planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedJsonCountReaderFactory(groupKeys.toArray, ops)
}

final class KeyedJsonCountReaderFactory(groupKeys: Array[String],
    ops: Seq[KeyedJsonSource.PushedAgg]) extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeyedFilePartition]
    new PartitionReader[InternalRow] {
      private var done = false

      override def next(): Boolean = !done

      override def get(): InternalRow = {
        done = true
        // zero-I/O fast path: key min/max come from the listing alone
        val n = if (!ops.contains(KeyedJsonSource.PushedCount)) 0L
        else {
          val fis = new FileInputStream(p.file)
          val stream =
            if (p.file.endsWith(".gz")) new GZIPInputStream(fis) else fis
          val in = new BufferedReader(
            new InputStreamReader(stream, StandardCharsets.UTF_8))
          try {
            var c = 0L
            var line = in.readLine()
            while (line != null) {
              if (line.nonEmpty) c += 1
              line = in.readLine()
            }
            c
          } finally in.close()
        }
        def keyVal(k: String): Long = k match {
          case "cx" => p.cx
          case "cy" => p.cy
        }
        InternalRow.fromSeq(groupKeys.toSeq.map(keyVal) ++ ops.map {
          case KeyedJsonSource.PushedCount => n
          case KeyedJsonSource.PushedKeyValue(k) => keyVal(k)
        })
      }

      override def close(): Unit = ()
    }
  }
}

final case class KeyedFilePartition(cx: Long, cy: Long, file: String)
  extends InputPartition

final case class KeyedJsonScan(path: String, pruning: Seq[Filter],
    required: StructType, rowCap: Option[Int] = None)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keyed path=$path, PrunedBy: ${pruning.mkString("[", ", ", "]")}" +
      rowCap.fold("")(n => s", PushedLimit: $n")

  override def planInputPartitions(): Array[InputPartition] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) return Array.empty
    // every Files.list stream is CLOSED after materializing: relying
    // on GC finalization leaks a directory fd per listing on a
    // long-lived driver (thousands of key dirs x repeated queries ->
    // "Too many open files")
    def listDir(p: Path): Seq[Path] = {
      val st = Files.list(p)
      try st.iterator.asScala.toList finally st.close()
    }
    def keyDirs(p: Path, prefix: String): Seq[(Long, Path)] =
      listDir(p)
        .filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith(prefix))
        .flatMap { d =>
          d.getFileName.toString.stripPrefix(prefix).toLongOption.map(_ -> d)
        }
    for {
      (cx, cxDir) <- keyDirs(root, "cx=").toArray
      (cy, cyDir) <- keyDirs(cxDir, "cy=")
      if pruning.forall(KeyedJsonSource.keep(_, cx, cy))
      f <- listDir(cyDir)
      name = f.getFileName.toString
      if name.endsWith(".json") || name.endsWith(".json.gz")
    } yield KeyedFilePartition(cx, cy, f.toString): InputPartition
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedJsonReaderFactory(required.fieldNames, rowCap)
}

final class KeyedJsonReaderFactory(cols: Array[String],
    rowCap: Option[Int] = None) extends PartitionReaderFactory {

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
      private var emitted = 0

      override def next(): Boolean = {
        // pushed LIMIT/TopN cap: stop decompressing at the cap
        if (rowCap.exists(emitted >= _)) { line = null; return false }
        line = in.readLine()
        while (line != null && line.isEmpty) line = in.readLine()
        if (line != null) emitted += 1
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
