package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.store.JsonStore

/** The graft-keyed DataSource V2 reader over JsonStore's layout:
  * key-filter pruning at the file listing, column pruning, and payload
  * round-trip through from_json.
  */
class KeyedSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val root = Files.createTempDirectory("keyed-src").toString

  private val PayloadSchema = StructType(Seq(
    StructField("px", LongType), StructField("v", StringType)))

  // 3 chips x 2 rows; JsonStore gzips one dir per (cx, cy)
  new JsonStore(root).write("segment",
    Seq(
      (1L, 10L, 100L, "a"), (1L, 10L, 101L, "b"),
      (1L, 20L, 102L, "c"), (1L, 20L, 103L, "d"),
      (2L, 10L, 104L, "e"), (2L, 10L, 105L, "f"))
      .toDF("cx", "cy", "px", "v"),
    Seq("cx", "cy"))

  private def read =
    spark.read.format("graft-keyed").load(s"$root/segment")

  test("reads every row and re-attaches the directory keys") {
    val rows = read
      .select($"cx", $"cy",
        from_json($"value", PayloadSchema).getField("px").as("px"))
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set(
      (1L, 10L, 100L), (1L, 10L, 101L), (1L, 20L, 102L), (1L, 20L, 103L),
      (2L, 10L, 104L), (2L, 10L, 105L)))
  }

  test("key filters prune the file listing (the S3-key GET analogue)") {
    val all = read
    val one = read.filter($"cx" === 1L && $"cy" === 20L)
    assert(one.rdd.getNumPartitions < all.rdd.getNumPartitions)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 2)
    // the pruning filters are visible in the scan description
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("graft-keyed"), plan)
  }

  test("In and range filters prune; residual evaluation keeps results exact") {
    val in = read.filter($"cy".isin(10L))
    assert(in.count() == 4)
    assert(in.rdd.getNumPartitions == 2) // cx=1/cy=10 and cx=2/cy=10
    // non-key residual on the payload still applies after the scan
    val f = read.filter($"cx" >= 2L &&
      from_json($"value", PayloadSchema).getField("v") === "e")
    assert(f.count() == 1)
  }

  test("COUNT(*) group-by-key pushes into the scan: one partial row per " +
    "file, no payload decode, results exact") {
    val df = read.groupBy($"cx", $"cy").count()
    val got = df.as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 2L), (1L, 20L, 2L), (2L, 10L, 2L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), plan)
  }

  test("global count() pushes too, and composes with exact key pruning") {
    val all = read.count()
    assert(all == 6L)
    val df = read.filter($"cx" === 1L).groupBy($"cy").count()
    assert(df.as[(Long, Long)].collect().toSet == Set((10L, 2L), (20L, 2L)))
    val plan = df.queryExecution.executedPlan.toString
    // the aggregation pushed BELOW the exactly-handled key filter: the
    // plan carries both the pruning filter and the pushed count
    assert(plan.contains("PushedAggregation"), plan)
    assert(plan.contains("PrunedBy"), plan)
  }

  test("MIN/MAX over key columns push down and answer from the " +
    "directory listing alone — files are never opened") {
    val df = read.groupBy($"cx")
      .agg(max($"cy").as("mx"), min($"cy").as("mn"))
    assert(df.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 20L, 10L), (2L, 10L, 10L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MINMAX(cy)"), plan)
    // global min/max push too
    val g = read.agg(min($"cx").as("a"), max($"cy").as("b"))
    assert(g.as[(Long, Long)].head() == ((1L, 20L)))
    assert(g.queryExecution.executedPlan.toString
      .contains("PushedAggregation"), "global min/max not pushed")
    // zero-I/O proof: corrupt every data file in a copied layout;
    // min/max still answers (listing-only), count must open and fails
    val root2 = Files.createTempDirectory("keyed-src2").toString
    new JsonStore(root2).write("segment",
      Seq((1L, 10L, 100L, "a"), (1L, 20L, 102L, "c"), (2L, 10L, 104L, "e"))
        .toDF("cx", "cy", "px", "v"),
      Seq("cx", "cy"))
    Files.walk(java.nio.file.Paths.get(s"$root2/segment"))
      .filter(p => p.toString.endsWith(".json.gz"))
      .forEach(p => Files.write(p, "not gzip".getBytes))
    val r2 = spark.read.format("graft-keyed").load(s"$root2/segment")
    assert(r2.groupBy($"cx").agg(max($"cy").as("m"))
      .as[(Long, Long)].collect().toSet == Set((1L, 20L), (2L, 10L)))
    intercept[org.apache.spark.SparkException] {
      r2.groupBy($"cx").count().collect()
    }
    // mixed count + min/max still pushes (and does open files)
    val mixed = read.groupBy($"cx")
      .agg(count(lit(1)).as("n"), max($"cy").as("m"))
    assert(mixed.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 4L, 20L), (2L, 2L, 10L)))
    assert(mixed.queryExecution.executedPlan.toString
      .contains("COUNT(*), MINMAX(cy)"), "mixed aggs not pushed together")
  }

  test("LIMIT pushes a per-reader row cap (partial); results exact") {
    val q = read.limit(3)
    assert(q.count() == 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 3"), plan)
    // partial: Spark's own global Limit stays on top
    assert(plan.contains("Limit") || plan.contains("limit"), plan)
  }

  test("top-N over KEY columns pushes the cap; payload orderings " +
    "don't") {
    // keys are constant per file, so a key-only ordering lets each
    // reader stand in with its first n rows — the global TakeOrdered
    // then works on pre-bounded input
    val byKey = read.orderBy($"cx".desc, $"cy".desc).limit(2)
    val keyRows = byKey.select($"cx", $"cy").as[(Long, Long)].collect()
    assert(keyRows.toSeq == Seq((2L, 10L), (2L, 10L)))
    assert(byKey.queryExecution.executedPlan.toString
      .contains("PushedLimit: 2"), "key-only top-N not pushed")
    // ordering touching the payload cannot be bounded per file
    val byValue = read.orderBy($"value").limit(2)
    assert(byValue.count() == 2)
    assert(!byValue.queryExecution.executedPlan.toString
      .contains("PushedLimit"), "payload top-N must not push")
    // and the payload ordering is still answered correctly
    assert(byValue.select($"value").as[String].collect()
      .forall(_.nonEmpty))
  }

  test("COUNT over a computed expression is NOT pushed: null-skipping " +
    "semantics survive") {
    // payloads are JSON objects, never parseable ints — SQL COUNT of
    // the cast must be 0; a pushed line count would overcount to 6
    val df = read.selectExpr("count(try_cast(value as int)) as n")
    assert(df.first().getLong(0) == 0L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"), plan)
  }

  test("identical scans compare equal (Seq filters, not Array) so " +
    "exchange/scan reuse can deduplicate them") {
    import org.apache.spark.sql.sources.EqualTo
    import graft.sources.{KeyedJsonScan, KeyedJsonSource}
    val a = KeyedJsonScan(s"$root/segment",
      Seq(EqualTo("cx", 1L)), KeyedJsonSource.Schema, None)
    val b = KeyedJsonScan(s"$root/segment",
      Seq(EqualTo("cx", 1L)), KeyedJsonSource.Schema, None)
    assert(a == b)
  }

  test("a missing load path fails with a named error, not a deep NPE") {
    val e = intercept[Throwable] {
      spark.read.format("graft-keyed").load().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("graft-keyed requires exactly one")),
      e.toString)
  }

  test("aggregates the source cannot compute stay in Spark (sum, avg, " +
    "distinct count)") {
    val s = read
      .select($"cx", from_json($"value", PayloadSchema)
        .getField("px").as("px"))
      .groupBy($"cx").agg(sum($"px").as("s"))
    assert(s.as[(Long, Long)].collect().toSet ==
      Set((1L, 406L), (2L, 209L)))
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"), plan)
  }
}
