package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import scala.collection.mutable

/** Connected components over an undirected pair graph `(d1, d2)` —
  * the cluster-resolution step after near-dup pair finding (the
  * reference's dedup analogue of `blackmagic/blueprints/prediction.py`'s
  * group-then-resolve shape; pair sources: x6 Jaccard, x7 MinHash-LSH).
  *
  * Scale design: pair finding is where the 100 TB lives; the
  * *thresholded* pair graph is orders of magnitude smaller (near-dup
  * clusters are overwhelmingly 2-5 node cliques). So:
  *
  *  - '''Fast path''' (edge count <= `maxDriverEdges`): collect the edge
  *    list and run union-find on the driver — O(E α(E)) in a few hundred
  *    MB for millions of edges, ONE distributed job instead of
  *    O(diameter) join+agg rounds. The collect is bounded by
  *    `limit(maxDriverEdges + 1)`, so an unexpectedly dense graph can
  *    never OOM the driver — it falls through instead.
  *  - '''Distributed fallback''': min-label propagation — per iteration
  *    ONE join + ONE min-agg, lineage cut by `localCheckpoint`;
  *    convergence detected by the (monotone) label sum going stationary.
  *    O(component diameter) iterations; the large-star/small-star
  *    rewrite is the upgrade path if components ever get deep.
  *
  * Output: `(doc_id, comp, csize)` — component = min member id, one row
  * per node that appears in any pair.
  */
object Components {

  /** Edges above this are left to the distributed path. 4M edges ≈
    * 64 MB collected — trivially driver-sized; raise with driver heap. */
  val DefaultMaxDriverEdges: Int = 4000000

  /** @param pairs two LongType columns (order/names ignored), one row
    *              per undirected edge. */
  def connected(pairs: DataFrame,
      maxDriverEdges: Int = DefaultMaxDriverEdges): DataFrame = {
    val spark = pairs.sparkSession
    // cache + count + collect, NOT limit(n).collect(): a global limit
    // over the pair-finding pipeline executes as an incremental
    // CollectLimit (1, then 4, then 16... partitions), re-running the
    // upstream joins once per scale-up step. The count materializes the
    // (tiny) pair list in one pass; the collect then reads the cache.
    val cached = pairs.cache()
    val n = cached.count()
    if (n > maxDriverEdges) propagate(cached)
    else {
      val out = unionFind(spark, cached.collect())
      cached.unpersist()
      out
    }
  }

  /** Driver union-find with path halving; component label = min member. */
  private def unionFind(spark: SparkSession, edges: Array[Row]): DataFrame = {
    val parent = mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min-id root, so the final root IS the component label
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    edges.foreach { r =>
      parent.getOrElseUpdate(r.getLong(0), r.getLong(0))
      parent.getOrElseUpdate(r.getLong(1), r.getLong(1))
      union(r.getLong(0), r.getLong(1))
    }
    val comp = parent.keys.toArray.map(n => n -> find(n))
    val csize = mutable.LongMap.empty[Long]
    comp.foreach { case (_, c) => csize(c) = csize.getOrElse(c, 0L) + 1 }
    val rows = comp.map { case (n, c) =>
      Row(n, c, csize(c))
    }.toIndexedSeq
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("comp", LongType, nullable = false),
      StructField("csize", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — the
    * O(log²)-round distributed path for DEEP components, where
    * min-label propagation's O(diameter) rounds would dominate.
    *
    * Per round, two edge rewrites, each ONE groupBy + ONE equi-join:
    *  - '''large-star''': every node attaches its strictly-larger
    *    neighbors to `min(Γ(v) ∪ {v})` — hangs heavy subtrees directly
    *    under local minima without ever growing the edge count beyond
    *    2|E| (the paper's invariant: edges only re-point downward).
    *  - '''small-star''': every node attaches its ≤-neighbors and
    *    itself to the group minimum — collapses the chains large-star
    *    leaves behind.
    *
    * Fixpoint = the edge multiset stops changing (checked with one
    * count + order-free xxhash64-sum aggregate per round — never a
    * distributed set-difference). At the fixpoint the edges ARE a star
    * forest rooted at component minima, so labels read off directly:
    * no closing label-propagation pass. `localCheckpoint` every round
    * cuts the lineage (the deep-iteration discipline — each round's
    * plan must not replay all prior rounds).
    *
    * Same output contract as [[connected]]: `(doc_id, comp, csize)`,
    * comp = min member id. ComponentsSpec pins bit-equality with the
    * union-find path, and that a 64-deep chain converges in ≤ 10
    * rounds (vs the 64 a pure propagation would need).
    */
  def contract(pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    import graft.StringToColumn
    var edges = pairs.toDF("a", "b").filter($"a" =!= $"b")
      .select(greatest($"a", $"b").as("hi"), least($"a", $"b").as("lo"))
      .distinct().localCheckpoint()
    // order-free fingerprint of the (distinct) edge set: count + XOR of
    // per-edge hashes — XOR instead of SUM because ANSI mode overflows
    // a sum of full-range longs
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(hi, lo))")).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = checksum(edges)
    var prevEdges = edges
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star: symmetric view centered on u; m = min(Γ(u) ∪ {u});
      // each strictly-larger neighbor v re-points to m
      val sym = edges.select($"hi".as("u"), $"lo".as("v"))
        .union(edges.select($"lo".as("u"), $"hi".as("v")))
      val mins = sym.groupBy($"u")
        .agg(least(min($"v"), first($"u")).as("m"))
      val ls = sym.filter($"v" > $"u").join(mins, "u")
        .select($"v".as("hi"), $"m".as("lo"))
        .filter($"hi" =!= $"lo").distinct()
      // small-star over the hi→lo orientation: m = min of u's smaller
      // neighborhood; everyone in it (and u) re-points to m
      val sMins = ls.groupBy($"hi").agg(min($"lo").as("m"))
      val ss = ls.join(sMins, "hi")
        .select($"lo".as("hi"), $"m".as("lo"))
        .filter($"hi" =!= $"lo")
        .union(sMins.select($"hi", $"m".as("lo")))
        .distinct()
      edges = ss.localCheckpoint()
      val cur = checksum(edges)
      // fingerprint equality is strong evidence, not proof: a (count,
      // xor-of-hashes) collision between DIFFERENT edge sets would
      // satisfy it and silently mislabel. Confirm the fixpoint with
      // ONE exact set-difference — counts already match, so a single
      // one-sided except is the full equality check — paid only on
      // the (rare) round whose fingerprints agree.
      converged = cur == prev && edges.except(prevEdges).isEmpty
      prevEdges = edges
      prev = cur
      iter += 1
    }
    // an unconverged edge set is NOT a star forest — reading labels
    // off it would silently mislabel; fail loudly instead (practical
    // convergence is < 10 rounds, the cap exists only as a backstop)
    require(converged,
      s"star contraction did not converge within $maxIters rounds")
    // star forest: every non-root appears as hi exactly once, pointing
    // at its component minimum; roots appear only as lo
    val labels = edges.select($"hi".as("doc_id"), $"lo".as("comp"))
      .union(edges.select($"lo", $"lo").distinct())
    labels
      .withColumn("csize",
        count(lit(1)).over(Window.partitionBy($"comp")).cast("long"))
      .select($"doc_id", $"comp", $"csize")
  }

  /** Distributed min-label propagation (the beyond-driver-scale path). */
  private def propagate(pairs: DataFrame): DataFrame = {
    import graft.StringToColumn
    val pr = pairs.toDF("d1", "d2")
    val und = pr.union(pr.select($"d2", $"d1")).toDF("a", "b").cache()
    var labels = und.select($"a".as("n")).distinct()
      .withColumn("m", $"n").localCheckpoint()
    // labels only ever decrease, so the label SUM is strictly monotone
    // until the fixpoint: convergence = unchanged sum, ONE small
    // aggregate per iteration. DECIMAL(38): an int64 sum overflows
    // (ANSI-fails) around 4e9 nodes with full-range ids — exactly the
    // scale this beyond-driver path exists for.
    def labelSum(): java.math.BigDecimal =
      labels.agg(sum($"m".cast("decimal(38,0)"))).first().getDecimal(0)
    var prev: java.math.BigDecimal = null
    var cur = labelSum()
    var iter = 0
    while (cur != prev && iter < 50) {
      val nbr = und.join(labels, und("b") === labels("n"))
        .select(und("a").as("n"), $"m")
      labels = labels.union(nbr)
        .groupBy($"n").agg(min($"m").as("m")).localCheckpoint()
      prev = cur
      cur = labelSum()
      iter += 1
    }
    und.unpersist()
    // a still-moving label sum means components deeper than the round
    // cap — mislabeling silently is worse than failing (deep graphs
    // should route through contract(), the O(log²)-round path)
    require(cur == prev,
      "label propagation did not converge within 50 rounds — " +
        "use Components.contract for deep components")
    labels
      .withColumn("csize",
        count(lit(1)).over(Window.partitionBy($"m")).cast("long"))
      .select($"n".as("doc_id"), $"m".as("comp"), $"csize")
  }
}
