package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BoundedCollect

class BoundedCollectSpec extends AnyFunSuite with SparkSpec {

  test("counts exactly while retaining at most cap items per key") {
    import spark.implicits._
    // key 1: 10 items (over cap 4); key 2: 3 items (under cap)
    val df = ((1 to 10).map(i => (1L, i.toLong)) ++
      Seq((2L, 100L), (2L, 101L), (2L, 102L)))
      .toDF("k", "id")
      .repartition(6) // force multi-partition merge path
    val out = df.groupBy($"k")
      .agg(BoundedCollect.udaf(4)($"id").as("p"))
      .select($"k", $"p.n".as("n"), size($"p.ds").as("kept"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(out(1L) == ((10L, 4)))
    assert(out(2L) == ((3L, 3)))
  }

  test("under-cap groups retain every item (order-insensitive)") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 7L), (1L, 6L)).toDF("k", "id")
      .repartition(3)
    val ds = df.groupBy($"k")
      .agg(BoundedCollect.udaf(100)($"id").as("p"))
      .select($"p.ds").as[Seq[Long]].head()
    assert(ds.sorted == Seq(5L, 6L, 7L))
  }
}
