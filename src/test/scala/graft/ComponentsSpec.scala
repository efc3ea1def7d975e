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
}
