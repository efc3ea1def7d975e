package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.store.{BucketedStore, JsonStore, ParquetStore}

/** Keyed store contracts (S6/S12/S13): dynamic partition overwrite
  * replaces delete+insert per key, other keys' partitions survive, and
  * the gzip-JSON codec round-trips.
  */
class StoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite rewrites only the written key") {
    val store = new ParquetStore(
      Files.createTempDirectory("graft-store-spec").toString)
    val v1 = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("cx", "cy", "v")
    store.write("seg", v1, Seq("cx", "cy"))
    // re-write ONLY chip (1, 10) with a new value
    val v2 = Seq((1L, 10L, "a2")).toDF("cx", "cy", "v")
    store.write("seg", v2, Seq("cx", "cy"))
    val got = store.read("seg", spark)
      .select($"cx", $"v").as[(Long, String)].collect().toSet
    // chip 1 replaced (S12 delete+insert), chip 2 untouched
    assert(got == Set((1L, "a2"), (2L, "b")))
  }

  test("gzip JSON store round-trips records and compresses files") {
    val root = Files.createTempDirectory("graft-json-spec").toString
    val store = new JsonStore(root)
    val df = (1 to 50).map(i => (i % 3L, i.toLong, s"text $i"))
      .toDF("cx", "id", "body")
    store.write("chip", df, Seq("cx"))
    val back = store.read("chip", spark)
    assert(back.count() == 50)
    assert(back.agg(sum($"id")).as[Long].head() == (1 to 50).sum)
    // the codec actually wrote gzip members
    val files = Files.walk(java.nio.file.Paths.get(root))
      .toArray.map(_.toString).filter(_.endsWith(".gz"))
    assert(files.nonEmpty)
  }

  test("bucketed store joins co-located entities without a shuffle") {
    val root = Files.createTempDirectory("graft-bkt-spec").toString
    val store = new BucketedStore(root, buckets = 4)
    val seg = (1 to 200).map(i => (i.toLong, s"seg $i")).toDF("k", "sv")
    val aux = (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "av")
    store.write("seg", seg, Seq("k"))
    store.write("aux", aux, Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the non-broadcast path so the bucket layout (not a
      // broadcast) is what eliminates the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = store.read("seg", spark)
        .join(store.read("aux", spark), "k")
      assert(joined.count() == 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
