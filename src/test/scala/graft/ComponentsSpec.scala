package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Components

class ComponentsSpec extends AnyFunSuite with SparkSpec {

  // two triangles sharing no nodes, one chain bridging into the first,
  // one isolated pair: components {1..5}, {10,11,12}, {20,21}
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (4L, 3L), (5L, 4L),
    (10L, 11L), (11L, 12L), (12L, 10L),
    (21L, 20L))

  private def run(maxDriverEdges: Int): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Components.connected(edges.toDF("d1", "d2"), maxDriverEdges)
      .orderBy("doc_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private val expected = Seq(
    (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
    (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
    (20L, 20L, 2L), (21L, 20L, 2L))

  test("driver union-find fast path labels components by min member") {
    assert(run(maxDriverEdges = 1000) === expected)
  }

  test("distributed label-propagation fallback agrees with union-find") {
    // edge cap below the edge count forces the propagate path
    assert(run(maxDriverEdges = 1) === expected)
  }

  test("star contraction agrees bit-for-bit with union-find") {
    import spark.implicits._
    val got = Components.contract(edges.toDF("d1", "d2"))
      .orderBy("doc_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === expected)
  }

  test("star contraction closes a 64-deep chain within 10 rounds") {
    // a path graph is the propagation worst case: min-label needs
    // O(length) rounds, star contraction O(log²). maxIters = 10 means
    // a non-converged run would emit wrong labels — equality with the
    // known answer IS the round-count pin.
    import spark.implicits._
    val chain = (0L until 64L).map(i => (i, i + 1))
    val got = Components.contract(chain.toDF("d1", "d2"), maxIters = 10)
      .orderBy("doc_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === (0L to 64L).map(i => (i, 0L, 65L)))
  }

  test("x66 PageRank: positive ranks, bounded mass, degree-led ordering") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("x66_graph_pagerank")(spark, dir)
      .select("user_id", "pr", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length > 100)
    // every node keeps at least the re-seed mass; floor division only
    // ever LEAKS mass, so the total stays below the initial n * 1e6
    rows.foreach { case (_, pr, _) => assert(pr >= 150000L) }
    assert(rows.map(_._2).sum <= rows.length * 1000000L)
    // on a symmetric graph stationary PR is degree-proportional; after
    // 3 rounds the top-ranked user already carries the max degree and
    // rank correlates strongly with degree (measured pearson 0.995)
    val uw = Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 600000000").as("w"))
      .distinct()
    val cp = uw.as("a").join(uw.as("b"),
        col("a.w") === col("b.w") && col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("u1"), col("b.user_id").as("u2"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 3)
    val deg = cp.select(col("u1")).union(cp.select(col("u2")))
      .groupBy("u1").agg(count(lit(1)).as("deg")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top = rows.minBy(_._3)
    assert(deg(top._1) == deg.values.max,
      s"top user ${top._1} deg ${deg(top._1)} != max ${deg.values.max}")
    val xs = rows.map(t => deg(t._1).toDouble)
    val ys = rows.map(_._2.toDouble)
    val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
    val corr = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
      (math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(ys.map(b => (b - my) * (b - my)).sum))
    assert(corr > 0.9, s"pearson(deg, pr) = $corr")
  }
}
