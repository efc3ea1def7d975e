package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{MlOps, TextOps, VectorOps}

/** Round-4 scale guards — the three round-3 "weak" marks, asserted so
  * they can't regress:
  *   1. m2's driver collect is bounded by the stratified caps BEFORE
  *      collection (never the whole table);
  *   2. x14's vocabulary broadcast drops its hint above the cap
  *      (shuffled-join fallback);
  *   3. ANN/LSH geometry is a scale input, not a constant — planes /
  *      cells / bands grow with corpus size, and refining the geometry
  *      only narrows candidate sets (the prefix property).
  */
class ScaleGuardsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("m2 training sample is capped per class before the collect") {
    import spark.implicits._
    val big = spark.range(30000)
      .select(lit(0).as("label"), array(lit(1f)).as("f"))
    val mid = spark.range(300)
      .select(lit(1).as("label"), array(lit(2f)).as("f"))
    val tiny = spark.range(3)
      .select(lit(2).as("label"), array(lit(3f)).as("f"))
    val counts = MlOps.trainingSample(big.union(mid).union(tiny))
      .groupBy($"label").count()
      .as[(Int, Long)].collect().toMap
    // dominant class hits the hard cap; small classes keep all rows
    assert(counts(0) == MlOps.TrainClassMax, counts)
    assert(counts(1) == 300L, counts)
    assert(counts(2) == 3L, counts)
    assert(counts.values.sum <= 3 * MlOps.TrainClassMax)
  }

  test("x14 never forces a broadcast: the vocabulary join follows " +
    "statistics and survives broadcast-off with identical results") {
    // default config at test scale: statistics legitimately choose a
    // broadcast of the tiny built vocabulary
    val a = TextOps.tfidfTop5(spark, dir).collect().toSeq
    // the 100 TB model: NOTHING fits a broadcast — because no hint
    // forces one, the term join must degrade to a shuffled join (the
    // old build-time df.count() guard is now the planner's job, with
    // no extra eager action at DataFrame-construction time)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = TextOps.tfidfTop5(spark, dir)
      val b = q.collect().toSeq
      val p = q.queryExecution.executedPlan.toString
      // the one BroadcastHashJoin-free shape: term join shuffles (the
      // broadcast(n) singleton is a nested-loop join, not a hash join)
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(a == b) // shuffled path is result-identical
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("x13 broadcast-quantizer fallback assigns the same cells as " +
    "the literal fold") {
    import spark.implicits._
    val e = VectorOps.normalizedEmbeddings(spark, dir)
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell".cast("long"))
        .as[(Long, Long)].collect().toSet
    // same quantizer, both assignment paths -> identical cell map
    assert(cellsOf(VectorOps.literalCells(e, 64)) ==
      cellsOf(VectorOps.joinCells(e, 64)))
    // and the end-to-end query still runs ABOVE the literal ceiling,
    // where the old implementation could not turn the cellsFor knob
    val big = VectorOps.annIvf(spark, dir,
      cells = VectorOps.MaxLiteralCells + 44)
    assert(big.count() > 0)
  }

  test("trained-book assignment: broadcast arm matches the literal " +
    "fold exactly, and kmeansBook trains past the literal ceiling") {
    import spark.implicits._
    val e = VectorOps.normalizedEmbeddings(spark, dir)
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell".cast("long"))
        .as[(Long, Long)].collect().toSet
    // same trained book through both arms -> identical cell map
    val book = VectorOps.kmeansBook(spark, dir)
    assert(cellsOf(VectorOps.assignCellsLiteral(e, book)) ==
      cellsOf(VectorOps.assignCellsJoin(e, book)))
    // and training itself runs ABOVE the ceiling: every Lloyd's
    // assignment routes through the broadcast relation (300 cells >
    // MaxLiteralCells = 256 — the old literal-only path would hit the
    // codegen/constant-pool wall here), and the trained search stays
    // usable end to end
    val cells = VectorOps.MaxLiteralCells + 44
    val big = VectorOps.kmeansBook(spark, dir, cells = cells)
    assert(big.length == cells, big.length.toString)
    val asg = cellsOf(VectorOps.assignCells(e, big))
    assert(asg.size == 500 && asg.forall { case (_, c) =>
      c >= 0 && c < cells })
    assert(VectorOps.annIvfTrained(spark, dir, cells = cells).count() > 0)
  }

  test("x29 probing more cells finds better-or-equal neighbors; " +
    "nprobe=1 degenerates to x13") {
    import spark.implicits._
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter($"rn" === 1).select($"qid", $"cos")
        .as[(Long, Double)].collect().toMap
    val p1 = VectorOps.annIvfProbe(spark, dir, nprobe = 1)
    val p2 = VectorOps.annIvfProbe(spark, dir, nprobe = 2)
    // single-probe is exactly the x13 query
    assert(p1.collect().toSeq ==
      VectorOps.annIvf(spark, dir).collect().toSeq)
    // the second probe can only improve the best neighbor
    val r1 = rank1(p1); val r2 = rank1(p2)
    assert(r1.keySet == r2.keySet)
    r1.keySet.foreach(q => assert(r2(q) >= r1(q), s"query $q regressed"))
  }

  test("LSH/IVF geometry scales with corpus size") {
    assert(VectorOps.planesFor(1000) == VectorOps.DefaultPlanes)
    assert(VectorOps.planesFor(1L << 30) > VectorOps.planesFor(1L << 20))
    assert(VectorOps.planesFor(1L << 40) > VectorOps.planesFor(1L << 30))
    assert(VectorOps.cellsFor(1000000L) > VectorOps.cellsFor(1000L))
    assert(VectorOps.cellsFor(100L) == VectorOps.DefaultCells)
    // minhash: a bigger corpus gets FEWER, longer bands (sparser
    // candidates); bands always divide the signature
    assert(TextOps.bandsFor(1000000000L) < TextOps.bandsFor(1000L))
    assert(16 % TextOps.bandsFor(1000000000L) == 0)
  }

  test("more planes refine the same corpus into more buckets") {
    val e = VectorOps.normalizedEmbeddings(spark, dir)
    val n8 = VectorOps.bucketed(e, 8).select("bkt").distinct().count()
    val n12 = VectorOps.bucketed(e, 12).select("bkt").distinct().count()
    assert(n12 > n8, s"12 planes: $n12 buckets, 8 planes: $n8")
  }

  test("x10: more planes -> candidate pairs are a subset " +
    "(prefix property), fewer -> superset") {
    def pairs(planes: Int): Set[(Long, Long)] =
      VectorOps.embedNeardup(spark, dir, planes).select("d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p6 = pairs(6); val p8 = pairs(8); val p10 = pairs(10)
    assert(p8.nonEmpty)
    assert(p10.subsetOf(p8), (p10 -- p8).toString)
    assert(p8.subsetOf(p6), (p8 -- p6).toString)
  }

  test("x11 stays green under non-default planes; coarser buckets find " +
    "better-or-equal neighbors") {
    def nn(planes: Int): Map[Long, Double] =
      VectorOps.annLsh(spark, dir, planes).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val n6 = nn(6); val n10 = nn(10)
    assert(n6.nonEmpty && n10.nonEmpty)
    // every vector with a 10-plane neighbor also has one at 6 planes,
    // and the 6-plane (coarser, bigger bucket) neighbor is >= as close
    n10.foreach { case (qid, cos10) =>
      assert(n6.contains(qid), s"qid $qid lost its bucket at 6 planes")
      assert(n6(qid) >= cos10, s"qid $qid: 6-plane $cos10 > ${n6(qid)}")
    }
  }

  test("x13 stays green with a non-default quantizer size") {
    val r = VectorOps.annIvf(spark, dir, cells = 32).collect()
    assert(r.nonEmpty)
    // top-3 per query, deterministic under re-run
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 3))
    val again = VectorOps.annIvf(spark, dir, cells = 32).collect()
    assert(r.toSeq == again.toSeq)
  }

  test("x7 stays green with a non-default band layout; splitting bands " +
    "only adds candidates") {
    def res(bands: Int): Set[(Long, Long)] =
      TextOps.minhashLsh(spark, dir, 16, bands).select("d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b4 = res(4); val b8 = res(8)
    assert(b4.nonEmpty)
    // a pair colliding in a 4-row band collides in both 2-row halves
    assert(b4.subsetOf(b8), (b4 -- b8).toString)
  }

  test("x34 PQ codes carry real signal: ADC top-5 overlaps the exact " +
    "top-5 well above chance") {
    val exact = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("x34_ann_pq")(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 5 results per query, and recall@5 far beyond the ~5/500 chance
    // level (measured 13/40 with the deterministic first-16 book;
    // a trained k-means book only raises it)
    assert(pq.length == 40, pq.length.toString)
    assert(pq.count(exact.contains) >= 10, s"overlap ${pq.count(exact.contains)}/40")
  }

  test("x52 exact refine dominates raw PQ ranking: recall@5 vs exact " +
    "x9 is >= x34's, and every refined list is the exact-cosine order " +
    "of a shortlist superset of it") {
    val exact = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairs(key: String) = SparkEntry.queries(key)(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pq = pairs("x34_ann_pq")
    val rf = pairs("x52_ann_pq_refine")
    assert(rf.length == 40, rf.length.toString)
    // the refine step re-orders a 20-deep ADC shortlist by the exact
    // cosine, so any true neighbor that survives the shortlist ranks
    // correctly — recall can only improve over raw 5-deep ADC
    val (pqR, rfR) = (pq.count(exact.contains), rf.count(exact.contains))
    assert(rfR >= pqR, s"refine recall $rfR < raw PQ recall $pqR")
    // and within each query the refined list keeps x9's exact relative
    // order for every neighbor both lists contain (the refine scoring
    // IS the exact scoring, restricted to the ADC shortlist)
    val exactRank = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rfRanked = SparkEntry.queries("x52_ann_pq_refine")(spark, dir)
      .select("qid", "nid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rfRanked.groupBy(_._1).foreach { case (_, ns) =>
      val kept = ns.sortBy(_._3).flatMap(p => exactRank.get((p._1, p._2)))
      assert(kept.sameElements(kept.sorted),
        s"refined order disagrees with exact order: ${kept.toSeq}")
    }
  }

  test("x68 SNM dedup: sort-order locality recovers the inverted-index " +
    "pair set with no pair join") {
    def pairs(key: String) = SparkEntry.queries(key)(spark, dir)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val snm = pairs("x68_snm_dedup")
    val idx = pairs("x6_ngram_jaccard")
    // on this corpus duplicates share their 8-token prefix, so every
    // x6 pair sorts adjacent and SNM finds all of them; SNM can never
    // invent a pair below the threshold, so equality is the exact pin
    assert(snm == idx, s"snm ${snm.size} vs index ${idx.size}")
    // and the plan has NO join operator at all — candidates come from
    // the sort, not from an index or a cross product
    val df = SparkEntry.queries("x68_snm_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), p)
  }

  test("x65 JL refine: recall@5 well above shortlist-chance level, and " +
    "the refined order is the exact-cosine order (refine property)") {
    val exactRank = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val jl = SparkEntry.queries("x65_ann_jl_refine")(spark, dir)
      .select("qid", "nid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(jl.length == 40, jl.length.toString)
    // measured 19/40 at the 100-deep shortlist on the near-uniform
    // testdata (chance for a 100-of-499 shortlist ≈ 1/5 of top-5 = 8);
    // floor leaves headroom for geometry tweaks
    val hits = jl.count(t => exactRank.contains((t._1, t._2)))
    assert(hits >= 14, s"recall $hits/40")
    // within each query the final list keeps x9's exact relative order
    // — the re-rank scoring IS the exact scoring on the shortlist
    jl.groupBy(_._1).foreach { case (_, ns) =>
      val kept = ns.sortBy(_._3).flatMap(t => exactRank.get((t._1, t._2)))
      assert(kept.sameElements(kept.sorted), kept.toSeq.toString)
    }
  }

  test("x53 MMR actually diversifies: step 1 is the exact rank-1 " +
    "neighbor, and the selected set's mean pairwise cosine is below " +
    "the plain top-5's") {
    import org.apache.spark.sql.Row
    val exact1 = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .filter(col("rn") === 1).select("qid", "nid").collect()
      .map { case Row(q: Long, n: Long) => q -> n }.toMap
    val mmr = SparkEntry.queries("x53_mmr_diversify")(spark, dir)
      .select("qid", "nid", "step").collect()
      .map { case Row(q: Long, n: Long, st: Long) => (q, n, st) }
    mmr.filter(_._3 == 1L).foreach { case (q, n, _) =>
      assert(exact1(q) == n, s"step 1 of qid $q is not the exact top-1")
    }
    // diversification: within each query, the average pairwise cosine
    // among MMR picks must not exceed the average among the top-5 by
    // pure relevance (x9) — otherwise the diversity term did nothing
    val vecs = VectorOps.normalizedEmbeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def meanPair(ids: Seq[Long]): Double = {
      val ps = for (a <- ids; b <- ids if a < b)
        yield vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
      ps.sum / ps.length
    }
    val top5 = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid").collect()
      .map { case Row(q: Long, n: Long) => (q, n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val sel = mmr.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val (dSel, dTop) = sel.keys.toSeq.sorted.map { q =>
      (meanPair(sel(q)), meanPair(top5(q)))
    }.unzip
    assert(dSel.sum <= dTop.sum + 1e-9,
      s"MMR mean pairwise cosine ${dSel.sum} > top-5's ${dTop.sum}")
  }

  test("x55 corpus-prep invariants: every survivor passes all gates, " +
    "is not a benchmark doc, and no two survivors share a content key " +
    "- and the pipeline actually dropped something") {
    import org.apache.spark.sql.Row
    import graft.functions.{TextExprs => T}
    val surv = SparkEntry.queries("x55_corpus_prep")(spark, dir)
      .collect().map { case Row(id: Long, nt: Long, sr: Double,
        ar: Double) => (id, nt, sr, ar) }
    assert(surv.nonEmpty)
    surv.foreach { case (id, nt, sr, ar) =>
      assert(nt >= 5 && ar >= 0.4 && sr <= 0.8,
        s"survivor $id violates a gate: tokens=$nt stop=$sr alpha=$ar")
      assert(id % 20 != 0, s"benchmark doc $id survived")
    }
    // first-occurrence dedup held: content keys are unique among
    // survivors (recomputed from the raw docs with the x5 expression)
    val ids = surv.map(_._1)
    val keys = Tables(spark, dir, "documents")
      .filter(col("doc_id").isin(ids.map(Long.box): _*))
      .select(md5(concat_ws(" ",
        slice(T.wsTokens(col("text")), 1, 8))).as("key"))
      .collect().map(_.getString(0))
    assert(keys.length == keys.distinct.length,
      "two survivors share a content key")
    // and the dedup/decontam stages did real work: fewer survivors
    // than gate-passing non-benchmark docs
    val passers = SparkEntry.queries("x2_quality")(spark, dir)
      .filter(col("n_tokens") >= 5 && col("alpha_ratio") >= 0.4 &&
        col("stop_ratio") <= 0.8 && col("doc_id") % 20 =!= 0)
      .count()
    assert(surv.length < passers,
      s"nothing dropped: ${surv.length} survivors of $passers passers")
  }

  test("x59 split assignment is append-stable: every doc keeps its " +
    "assignment as the corpus grows (the property hash splits exist " +
    "for, which seeded randomSplit does not have)") {
    import graft.functions.{TextExprs => T}
    def asg(d: String) = graft.Tables(spark, d, "documents")
      .select(col("doc_id"), T.splitOf(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = asg("/root/testdata/sf0.001")
    val big = asg(dir) // sf0.01 — a strict superset corpus
    val shared = small.keySet.intersect(big.keySet)
    assert(shared.nonEmpty)
    shared.foreach { id =>
      assert(small(id) == big(id),
        s"doc $id changed split: ${small(id)} -> ${big(id)}")
    }
    // and the assignment is a real partition of the corpus
    assert(big.values.toSet == Set("train", "val", "test"))
  }

  test("x61 PRF actually expands: every doc ranked in both rounds " +
    "scores at least its round-1 BM25 (contributions are nonnegative " +
    "and the expanded query is a superset), and the feedback changed " +
    "at least one ranking") {
    import org.apache.spark.sql.Row
    val r1 = SparkEntry.queries("x47_bm25")(spark, dir)
      .select("qid", "doc_id", "bm25").collect()
      .map { case Row(q: Long, d: Long, s: Long) => (q, d) -> s }.toMap
    val r2 = SparkEntry.queries("x61_prf_expansion")(spark, dir)
      .select("qid", "doc_id", "bm25_prf").collect()
      .map { case Row(q: Long, d: Long, s: Long) => (q, d) -> s }.toMap
    assert(r2.nonEmpty)
    val shared = r1.keySet.intersect(r2.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(r2(k) >= r1(k),
        s"expanded score shrank for $k: ${r1(k)} -> ${r2(k)}")
    }
    assert(r1.keySet != r2.keySet,
      "PRF left every top-5 list unchanged — expansion did nothing")
  }

  test("x37 IVF-PQ with one cell degenerates to flat PQ exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq
    val flat = rows(VectorOps.annPqFlat(spark, dir, k = 3))
    val one = rows(VectorOps.annIvfPq(spark, dir, cells = 1, k = 3))
    assert(one.nonEmpty)
    assert(one == flat, s"ivfpq(cells=1) != flat pq")
  }

  test("x39/x40 k-means book beats the untrained seed on quantization " +
    "distortion and corpus-wide nprobe=1 recall; x40 recall@3 stays " +
    "far above chance") {
    val e = VectorOps.normalizedEmbeddings(spark, dir).cache()
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // exact nearest neighbor per vector — the 500-sample ground truth
    // (the 8-query top-3 overlap is noise at +-3 pairs; this is the
    // statistic nprobe=1 recall actually depends on: is a vector's
    // true neighbor in ITS cell?)
    val nn = vecs.map { case (id, v) =>
      id -> vecs.iterator.filter(_._1 != id)
        .maxBy(o => (cos(v, o._2), -o._1))._1
    }
    def cellsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def coCell(assign: Map[Long, Long]): Int =
      nn.count { case (a, b) => assign(a) == assign(b) }
    val seed = (0 until VectorOps.DefaultCells)
      .map(i => vecs(i.toLong)).toArray
    val book = VectorOps.kmeansBook(spark, dir)
    val un = cellsOf(VectorOps.literalCells(e, VectorOps.DefaultCells))
    val tr = cellsOf(VectorOps.assignCells(e, book))
    // (1) corpus-wide nprobe=1 recall: the true neighbor lands in the
    // query's cell MORE often under the trained book (measured
    // 108/500 -> 142/500 at sf0.01)
    assert(coCell(tr) > coCell(un),
      s"trained co-cell ${coCell(tr)} <= untrained ${coCell(un)}")
    // (2) the k-means objective itself: mean cosine to the assigned
    // centroid improves over the first-16 seed (0.246 -> 0.329)
    def distortion(cents: Array[Array[Double]]): Double = {
      val s = vecs.values.map(v => cents.map(cos(v, _)).max).sum
      s / vecs.size
    }
    assert(distortion(book) > distortion(seed) + 0.02,
      s"distortion ${distortion(book)} vs seed ${distortion(seed)}")
    // (3) x40's end-to-end recall@3 vs exact x9 stays far above the
    // ~3/500-per-query chance level
    val exact = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .collect().filter(_.getLong(3) <= 3L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = VectorOps.annIvfTrained(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 24, pairs.length.toString)
    assert(pairs.count(exact.contains) >= 15,
      s"recall ${pairs.count(exact.contains)}/24")
    // (4) training actually moved the book off its seed
    assert(book.zip(seed).exists { case (b, s0) =>
      !java.util.Arrays.equals(b, s0) }, "Lloyd's rounds were a no-op")
  }

  test("x46 farthest-point seeding: literal and join arms agree, the " +
    "walk actually spreads the seeds, and the seeded book holds the " +
    "first-N book's distortion") {
    val e = VectorOps.normalizedEmbeddings(spark, dir).cache()
    // literal-DotMatrix and broadcast-join arms select IDENTICAL seeds
    // (maxLiteral=2 forces the join arm from the third selection on)
    val viaLit = VectorOps.farthestPointSeeds(e, 8)
    val viaJoin = VectorOps.farthestPointSeeds(e, 8, maxLiteral = 2)
    assert(viaLit.length == 8 && viaJoin.length == 8)
    assert(viaLit.zip(viaJoin).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) },
      "literal vs join seeding arms diverged")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // max-min objective: the farthest-point seed set is more spread
    // than first-N — its max pairwise cosine (closest pair) is lower
    def closestPair(cents: Array[Array[Double]]): Double = (for {
      i <- cents.indices; j <- cents.indices if i < j
    } yield cos(cents(i), cents(j))).max
    val vecs = e.collect()
      .map(r => r.getSeq[Double](1).toArray)
    val firstN = vecs.take(VectorOps.DefaultCells)
    val fps = VectorOps.farthestPointSeeds(e, VectorOps.DefaultCells)
    assert(closestPair(fps) < closestPair(firstN),
      s"seed spread ${closestPair(fps)} !< ${closestPair(firstN)}")
    // after Lloyd's rounds the seeded book's distortion (mean max-cos
    // to a centroid, the 500-sample statistic) does not lose to the
    // first-N book
    def distortion(cents: Array[Array[Double]]): Double =
      vecs.map(v => cents.map(cos(v, _)).max).sum / vecs.length
    val seededBook = VectorOps.kmeansBookSeeded(spark, dir)
    val firstNBook = VectorOps.kmeansBook(spark, dir)
    assert(distortion(seededBook) >= distortion(firstNBook),
      s"seeded ${distortion(seededBook)} < firstN ${distortion(firstNBook)}")
    e.unpersist()
    ()
  }

  test("x41/x42 trained PQ books: Lloyd's rounds monotonically cut " +
    "subspace L2 distortion and the trained search keeps real signal") {
    // classical-PQ objective: mean min-over-codewords ||sv - c||²
    val vecs = VectorOps.normalizedEmbeddings(spark, dir).collect()
      .map(_.getSeq[Double](1).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def distortion(books: Array[Array[Array[Double]]]): Double = {
      val per = for (v <- vecs; ss <- books.indices) yield
        books(ss).map(l2(VectorOps.subOf(v, ss), _)).min
      per.sum / per.length
    }
    val d0 = distortion(VectorOps.pqBooksTrained(spark, dir, iters = 0))
    val d1 = distortion(VectorOps.pqBooksTrained(spark, dir, iters = 1))
    val d2 = distortion(VectorOps.pqBooksTrained(spark, dir, iters = 2))
    // each round is a Lloyd's step: distortion never increases, and
    // the first round strictly improves on the first-16 seed
    assert(d1 < d0, s"round 1 distortion $d1 >= seed $d0")
    assert(d2 <= d1 + 1e-12, s"round 2 distortion $d2 > round 1 $d1")
    // the trained ADC search still carries real signal vs exact x9
    val exact = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = VectorOps.annPqTrained(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.length == 40)
    assert(pq.count(exact.contains) >= 10,
      s"overlap ${pq.count(exact.contains)}/40")
  }

  test("PQ geometry headroom: 64-codeword (6-bit) books strictly " +
    "improve subspace distortion and hold recall vs the 16-codeword " +
    "default — the codebook-size knob a 100 TB operator turns") {
    val vecs = VectorOps.normalizedEmbeddings(spark, dir).collect()
      .map(_.getSeq[Double](1).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def distortion(books: Array[Array[Array[Double]]]): Double = {
      val per = for (v <- vecs; ss <- books.indices) yield
        books(ss).map(l2(VectorOps.subOf(v, ss), _)).min
      per.sum / per.length
    }
    val b16 = VectorOps.pqBooksTrained(spark, dir)
    val b64 = VectorOps.pqBooksTrained(spark, dir, codeK = 64)
    assert(b64.forall(_.length == 64))
    val (d16, d64) = (distortion(b16), distortion(b64))
    // the 500-sample statistic that IS monotone in the knob: 4x the
    // codewords strictly cut quantization error in every geometry
    assert(d64 < d16, s"codeK=64 distortion $d64 !< codeK=16 $d16")
    // end-to-end the wider-book search must keep real signal vs exact
    // x9 (the 8-query top-5 overlap itself is +-3-pair noise at this
    // corpus size — x40's spec documents the same — so the floor, not
    // a strict ordering, is the pinnable claim; measured 11 vs 13/40)
    val exact = SparkEntry.queries("x9_cosine_knn")(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = VectorOps.annPqTrained(spark, dir, codeK = 64)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.length == 40)
    assert(wide.count(exact.contains) >= 10,
      s"codeK=64 overlap ${wide.count(exact.contains)}/40")
  }

  test("x44 residual IVF-PQ ranks in-cell candidates more faithfully " +
    "than raw-code x43 (the residual L2-ADC is the exact in-cell " +
    "metric, PQ-approximated)") {
    // ground truth: each query's EXACT best in-cell neighbor under
    // the trained coarse book (same integerized-cosine tie-break as
    // the engine). Note the win is ranking FAITHFULNESS, not
    // reconstruction error — at this corpus scale the 16-cell coarse
    // book captures only cos~0.33 of a unit vector's energy, so
    // residual norms exceed 1 and residuals are no easier to
    // quantize; what residual coding buys here is that in-cell
    // q - v = r_q - r_v exactly, so L2-ADC over residuals targets the
    // true cosine order while raw dot-ADC does not.
    val book = VectorOps.kmeansBook(spark, dir)
    val asg = VectorOps.assignCells(
        VectorOps.normalizedEmbeddings(spark, dir), book)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getLong(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byCell = asg.groupBy(_._3)
    val exactBest = (0 until 8).map { q =>
      val (qid, qv, qc) = asg.find(_._1 == q).get
      val cands = byCell(qc).filter(_._1 != qid)
      q.toLong -> cands
        .maxBy(c => (math.rint(cos(qv, c._2) * 10000), -c._1))._1
    }.toMap
    def agree(df: org.apache.spark.sql.DataFrame): Int = {
      val top = df.collect().filter(_.getLong(3) == 1L)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      exactBest.count { case (q, n) => top.get(q).contains(n) }
    }
    val raw = agree(VectorOps.annIvfPqTrained(spark, dir)
      .select("qid", "nid", "adc", "rn"))
    val res = agree(VectorOps.annIvfPqResidual(spark, dir)
      .select("qid", "nid", "adc", "rn"))
    assert(res >= raw, s"residual rank-1 agreement $res < raw $raw")
    assert(res >= 2, s"residual agreement $res/8 (measured 3/8)")
    // and the artifact the comment above documents, pinned so the
    // claim stays honest: at this corpus scale residual coding does
    // NOT reduce reconstruction error (measured 0.57 raw vs 0.74
    // residual) — the win is the metric, not the magnitude
    val rawErr = VectorOps.pqReconstructionError(spark, dir,
      residual = false)
    val resErr = VectorOps.pqReconstructionError(spark, dir,
      residual = true)
    assert(rawErr < resErr,
      s"expected the documented artifact: raw $rawErr < residual $resErr")
  }

  test("x43 fully-trained IVF-PQ with one coarse cell degenerates to " +
    "the flat trained-PQ search exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq
    val one = rows(VectorOps.annIvfPqTrained(spark, dir,
      coarseCells = 1, k = 3))
    val flat = rows(VectorOps.annPqTrained(spark, dir, k = 3))
    assert(one.nonEmpty)
    assert(one == flat, "ivfpq-trained(cells=1) != flat trained PQ")
  }

  test("x38 IVF-PQ nprobe=1 degenerates to x37 exactly; probing more " +
    "cells only improves the best ADC neighbor") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq
    // single-probe is exactly the x37 query (same probe convention)
    assert(rows(VectorOps.annIvfPqProbe(spark, dir, nprobe = 1)) ==
      rows(VectorOps.annIvfPq(spark, dir)))
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().filter(_.getLong(3) == 1L)
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val r1 = rank1(VectorOps.annIvfPqProbe(spark, dir, nprobe = 1)
      .select("qid", "nid", "adc", "rn"))
    val r2 = rank1(VectorOps.annIvfPqProbe(spark, dir, nprobe = 2)
      .select("qid", "nid", "adc", "rn"))
    assert(r1.keySet == r2.keySet)
    r1.keySet.foreach(q => assert(r2(q) >= r1(q), s"query $q regressed"))
  }

  test("trained-ANN bodies leave no pinned cache blocks behind " +
    "(repeated trained-family runs can't accumulate storage)") {
    spark.sharedState.cacheManager.clearCache()
    assert(VectorOps.annIvfTrained(spark, dir).count() > 0)
    assert(VectorOps.annIvfPqTrained(spark, dir).count() > 0)
    assert(VectorOps.annIvfPqResidual(spark, dir).count() > 0)
    assert(VectorOps.annIvfPqResidualProbe(spark, dir).count() > 0)
    assert(VectorOps.pqReconstructionError(spark, dir,
      residual = true) > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "trained-ANN run left cached blocks pinned")
  }

  test("x45 residual nprobe=1 reproduces x44's neighbors and ranks " +
    "(adc shifts by the per-query ||r_q||² constant, which cannot " +
    "reorder an in-cell ranking); probing a second cell only improves " +
    "the offset-corrected best neighbor") {
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val p1 = VectorOps.annIvfPqResidualProbe(spark, dir, nprobe = 1)
    assert(ranks(p1) == ranks(VectorOps.annIvfPqResidual(spark, dir)),
      "nprobe=1 did not degenerate to x44")
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().filter(_.getLong(3) == 1L)
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val r1 = rank1(p1.select("qid", "nid", "adc", "rn"))
    val r2 = rank1(VectorOps.annIvfPqResidualProbe(spark, dir,
      nprobe = 2).select("qid", "nid", "adc", "rn"))
    // the offset correction makes scores cross-cell comparable
    // (≈ -||q - v||²), so a wider probe can only raise the best score
    assert(r1.keySet == r2.keySet)
    r1.keySet.foreach(q => assert(r2(q) >= r1(q), s"query $q regressed"))
  }

  test("x45 residual path at codeK=64: nprobe monotonicity holds " +
    "under the wider book too (the geometry-headroom claim, extended " +
    "from x42's flat path to the residual one)") {
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("qid", "nid", "adc", "rn").collect()
        .filter(_.getLong(3) == 1L)
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val r1 = rank1(VectorOps.annIvfPqResidualProbe(spark, dir,
      nprobe = 1, codeK = 64))
    val r2 = rank1(VectorOps.annIvfPqResidualProbe(spark, dir,
      nprobe = 2, codeK = 64))
    val r4 = rank1(VectorOps.annIvfPqResidualProbe(spark, dir,
      nprobe = 4, codeK = 64))
    assert(r1.nonEmpty && r1.keySet == r2.keySet && r2.keySet == r4.keySet)
    // candidate pools only grow with nprobe and per-candidate scores
    // are probe-independent, so the best offset-corrected ADC is
    // monotone — at ANY codebook width
    r1.keySet.foreach { q =>
      assert(r2(q) >= r1(q), s"query $q: nprobe 2 < 1 at codeK=64")
      assert(r4(q) >= r2(q), s"query $q: nprobe 4 < 2 at codeK=64")
    }
  }

  test("production entry points default to corpus-scaled geometry: " +
    "the scaled default engages past the fixed-geometry crossover " +
    "while registry bodies stay pinned") {
    val n = VectorOps.normalizedEmbeddings(spark, dir).count()
    val (cells, planes) = VectorOps.scaledGeometry(spark, dir)
    // this corpus is past the 256-vector crossover, so the scaled
    // default must EXCEED the pinned registry geometry
    assert(n > 256, s"fixture too small: $n")
    assert(cells == VectorOps.cellsFor(n) && cells > 16,
      s"cells $cells for n=$n")
    assert(planes == VectorOps.planesFor(n), s"planes $planes")
    // the knob keeps scaling: every corpus doubling past the
    // occupancy target adds a plane; cells track sqrt(n)
    assert(VectorOps.cellsFor(1000000L) == 1000)
    assert(VectorOps.planesFor(1L << 40) ==
      VectorOps.planesFor(1L << 39) + 1)
    // the scaled entry points run end-to-end with the wider geometry
    // and keep the engine's output contract (ranks 1..k per source)
    val g = VectorOps.knnGraphScaled(spark, dir).collect()
    assert(g.nonEmpty)
    g.groupBy(_.getLong(0)).foreach { case (src, rows) =>
      val rns = rows.map(_.getLong(3)).sorted.toSeq
      assert(rows.length <= 4 && rns == (1L to rows.length),
        s"src $src ranks $rns")
    }
    val ivf = VectorOps.annIvfTrainedScaled(spark, dir).collect()
    assert(ivf.nonEmpty && ivf.forall(r => r.getLong(3) >= 1 &&
      r.getLong(3) <= 3))
  }

  test("x108's documented 100 TB swap holds: approx_percentile (the " +
    "mergeable GK sketch) reproduces the exact per-source quartiles " +
    "within its accuracy parameter on this corpus") {
    import spark.implicits._
    // the exact profile (the oracle-checked registry body)
    val exact = SparkEntry.queries("x108_quality_profile")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the at-scale form: ONE mergeable-sketch aggregation, no rank
    // window, no per-source sort — map-side partials merge like any
    // hash agg, so the quantile report costs one exchange at any scale
    val q = graft.queries.TextOps.qualityBySource(spark, dir)
    val approx = q.groupBy($"source")
      .agg(percentile_approx($"q6", array(lit(0.25), lit(0.5), lit(0.75)),
        lit(10000)).as("qs"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (src, (p25, p50, p75)) =>
      val (qs, n) = approx(src)
      // accuracy 10000 => rank error <= n/10000 ranks; translate to a
      // value tolerance via the observed interquartile spread
      val spread = math.max(1L, (p75 - p25) / 2)
      val tol = math.max(spread / 5, (n / 100) + 1)
      Seq(p25, p50, p75).zip(qs).foreach { case (want, got) =>
        assert(math.abs(got - want) <= math.max(tol, want / 20),
          s"source $src: sketch $got vs exact $want (tol $tol)")
      }
    }
  }

  test("x111 hard-negative exclusion engages: a query's near-dup is " +
    "a scored BM25 candidate yet never appears among its negatives, " +
    "and the rank refills to k after exclusion") {
    import spark.implicits._
    // doc 8 ⋈ doc 245 is this corpus's lowest-id near-dup pair (x6);
    // widen the query set to include doc 8 so exclusion has work
    val pair = SparkEntry.queries("x6_ngram_jaccard")(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect()
      .minBy { case (a, b) => math.min(a, b) }
    val (q, dup) = if (pair._1 < pair._2) pair else pair.swap
    val qMax = q + 1
    // the near-dup IS a candidate (near-identical text shares terms)
    val cand = TextOps.bm25Scores(spark, dir, qMax)
      .filter($"qid" === q && $"doc_id" === dup)
    assert(cand.count() == 1, s"near-dup $dup not even scored for $q")
    val hn = TextOps.hardNegatives(spark, dir, k = 10, qMax = qMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // ...but is never emitted as a negative
    assert(!hn.exists(r => r._1 == q && r._2 == dup),
      s"near-dup $dup emitted as a hard negative of $q")
    // the rank refills: every query still gets k usable negatives
    // with contiguous ranks
    hn.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"qid $qid ranks not contiguous")
      assert(rows.length == 10, s"qid $qid only ${rows.length} negatives")
    }
  }

  test("x118's inlined shortlist scoring cannot drift from bm25TopK: " +
    "every reranked doc sits in the BM25 top-20, and MaxSim reorders " +
    "rather than rescopes") {
    import spark.implicits._
    // the body inlines x47's scoring over shared tf frames (one
    // corpus pass); if that copy ever diverges from bm25TopK's
    // arithmetic or rank order, docs outside the true top-20 leak in
    val top20 = TextOps.bm25TopK(spark, dir, k = 20)
      .select($"qid", $"doc_id").as[(Long, Long)].collect().toSet
    val li = TextOps.lateInteractionRerank(spark, dir)
      .select($"qid", $"doc_id").as[(Long, Long)].collect()
    assert(li.nonEmpty)
    val leaked = li.filterNot(top20.contains)
    assert(leaked.isEmpty,
      s"reranked docs outside the BM25 top-20 shortlist: " +
        leaked.take(5).mkString(", "))
  }

  test("the skip-gram window pass consumes the node2vec corpus too: " +
    "pairs stay within one walk and counts are window-symmetric") {
    import spark.implicits._
    val pairs = VectorOps.skipGramPairsOver(
      VectorOps.node2vecWalks(spark, dir))
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // window symmetry: (a, b, n) implies (b, a, n) — every pair is
    // seen from both endpoints of the same two walk positions
    val m = pairs.map { case (a, b, n) => ((a, b), n) }.toMap
    pairs.foreach { case (a, b, n) =>
      assert(m.get((b, a)).contains(n), s"asymmetric pair ($a, $b)")
    }
    // total pair count = sum over walks of ordered in-window position
    // pairs; 5-step walks with window 2 have 14 ordered pairs each
    val walks = VectorOps.node2vecWalks(spark, dir)
      .groupBy($"qid", $"wid")
      .agg(org.apache.spark.sql.functions.count("*").as("len"))
      .as[(Long, Long, Long)].collect()
    val expected = walks.map { case (_, _, len) =>
      (0L until len).map(i =>
        math.min(i, 2L) + math.min(len - 1 - i, 2L)).sum
    }.sum
    assert(pairs.map(_._3).sum == expected,
      s"pair mass ${pairs.map(_._3).sum} != $expected")
  }

  test("x122 trained embeddings: deterministic, max-abs normalized, " +
    "near-orthogonal dims, SPPMI-vocabulary-complete; x123 neighbors " +
    "are a full exact rank over them") {
    import spark.implicits._
    val e = VectorOps.nodeEmbeddings(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(e.nonEmpty)
    // deterministic end to end: walks, pairs, SPPMI, and every integer
    // round are seeded/exact — a second full run is bit-identical
    // (this is what makes the 100 TB training job retryable AND what
    // the oracle hash-match rests on)
    assert(VectorOps.nodeEmbeddings(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq == e)
    // max-abs normalization: both dims live in [-10000, 10000] and
    // dim 1 touches its scale (the max-abs element maps to ±10000)
    assert(e.forall(t => math.abs(t._2) <= 10000 &&
      math.abs(t._3) <= 10000))
    assert(e.map(t => math.abs(t._2)).max == 10000,
      "dim 1 lost its normalization scale")
    // integer Gram-Schmidt leaves only rounding residue: |w1·w2| is
    // orders below ‖w1‖² (exact orthogonality is impossible in longs;
    // unprojected random dims would correlate at the same order)
    val dot12 = e.map(t => t._2 * t._3).sum
    val n1 = e.map(t => t._2 * t._2).sum
    assert(math.abs(dot12) * 50 < n1,
      s"dims far from orthogonal: |$dot12| vs n1=$n1")
    // vocabulary = every node with a positive-SPPMI pair as center
    val sppmi = VectorOps.sppmiRelation(
      VectorOps.skipGramPairs(spark, dir))
    val vocab = sppmi.select($"center").distinct()
      .as[Long].collect().toSet
    assert(e.map(_._1).toSet == vocab, "embedding vocabulary drifted")
    // scale guard: the SPPMI relation's plan carries no cartesian
    // product — totals ride broadcast 1-row frames, the matvec join
    // is keyed on context (the trainer's rounds reuse this shape)
    val plan = sppmi.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the consumer: every start node present in the vocabulary gets
    // a full exact top-5, ranks contiguous, self excluded
    val nb = VectorOps.embedNeighbors(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val qids = nb.map(_._1).distinct.sorted
    assert(qids == vocab.filter(_ < 8).toSeq.sorted)
    qids.foreach { q =>
      val rows = nb.filter(_._1 == q).sortBy(_._4)
      assert(rows.map(_._4) == (1L to rows.length).toSeq)
      assert(rows.forall(_._2 != q), "self-match leaked")
      // dot ordering is the exact integer rank
      assert(rows.map(_._3) == rows.map(_._3).sorted.reverse)
    }
    assert(nb.forall(t => t._5 == 0L || t._5 == 1L))
  }

  test("eager iterative bodies (graph contraction, incremental graph " +
    "append) leave no pinned cache blocks behind") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    // star contraction over a 2000-edge chain forest
    val pairs = spark.range(2000)
      .select(($"id" * 2).as("a"), ($"id" * 2 + 2).as("b"))
    assert(graft.ops.Components.contract(pairs).count() > 0)
    // incremental k-NN graph append through a store
    val root = java.nio.file.Files
      .createTempDirectory("graft-hygiene").toString
    val store = new graft.store.ParquetStore(root)
    VectorOps.persistAnnBooks(spark, dir, store)
    val batch = VectorOps.normalizedEmbeddings(spark, dir)
      .filter($"vec_id" < 64)
    VectorOps.appendKnnGraph(spark, batch, 0L, store)
    assert(spark.sharedState.cacheManager.isEmpty,
      "eager iterative body left cached blocks pinned")
  }

  test("x33 incremental dedup agrees with x7's self-dedup on the " +
    "new-vs-old slice") {
    // x7 over the whole corpus, restricted to odd(new)/even(old)
    // pairs, must contain every x33 match — the incremental path may
    // never invent a pair the batch path wouldn't find, and its
    // best-match per new doc must be the top x7 pair for that doc
    val x7 = SparkEntry.queries("x7_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossPairs = x7.flatMap { case (d1, d2, sim) =>
      Seq((d1, d2, sim), (d2, d1, sim)) // both orientations
    }.filter { case (n, o, _) => n % 2 == 1 && o % 2 == 0 }
    val best = crossPairs.groupBy(_._1).map { case (n, ps) =>
      n -> ps.map(p => (-p._3, p._2)).min // max sim, tie -> min old id
    }
    val x33 = SparkEntry.queries("x33_incremental_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(x33.nonEmpty)
    x33.foreach { case (n, o, sim) =>
      assert(best.contains(n), s"x33 invented a match for doc $n")
      assert(best(n) == ((-sim, o)),
        s"doc $n: x33 picked ($o, $sim), x7 best is ${best(n)}")
    }
    assert(x33.map(_._1).toSet == best.keySet,
      "x33 missed new docs that x7 matches cross-slice")
  }

  test("x48 SQ8: the 8-bit dequantized search keeps near-exact recall " +
    "vs x9 brute force (quantization error at 8 bits is far below the " +
    "neighbor gaps)") {
    def pairs(n: String) = SparkEntry.queries(n)(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("x9_cosine_knn")
    val sq8 = pairs("x48_ann_sq8")
    assert(sq8.size == 40)
    val overlap = sq8.count(exact.contains)
    assert(overlap >= 35, s"sq8 overlap $overlap/40 vs exact")
  }

  test("x49 semantic dedup: survivors and dropped partition the " +
    "corpus, the min-id member of every cell always survives, and " +
    "raising the threshold only shrinks the dropped set") {
    val n = spark.read
      .parquet(s"$dir/embeddings.parquet").count()
    def survivors(t: Double): Set[Long] =
      VectorOps.semanticDedup(spark, dir, threshold = t)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val s04 = survivors(0.4)
    val s09 = survivors(0.9)
    assert(s04.size <= n && s04.nonEmpty)
    // dropped(0.9) ⊆ dropped(0.4): a ≥0.9 pair is a ≥0.4 pair
    assert(s04.subsetOf(s09), "survivors must grow with the threshold")
    assert(s09.size <= n)
    // the min-id member of any cell can never be dropped (droppers
    // need a SMALLER id in the same cell) — spot-check the global min
    assert(s04.contains(0L), "vec 0 can never be dropped")
    // the result frame's cells are consistent with the x13 quantizer:
    // survivors joined back to the full assignment agree on cell
    val asg = VectorOps.semanticDedup(spark, dir, threshold = 2.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg.size == n, "threshold 2.0 (cos max 1) must drop nothing")
    val out = VectorOps.semanticDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    out.foreach { case (v, c) =>
      assert(asg(v) == c, s"vec $v cell drifted: $c vs ${asg(v)}")
    }
  }

  test("x51 IVF-SQ8 with one cell degenerates to the flat SQ8 search " +
    "exactly; at the default geometry it stays in-cell-faithful to " +
    "exact x13") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "sq8", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq
    val one = rows(VectorOps.annIvfSq8(spark, dir, cells = 1, k = 3))
    val flat = rows(VectorOps.annSq8(spark, dir, k = 3))
    assert(one.nonEmpty)
    assert(one == flat, "ivf-sq8(cells=1) != flat sq8")
    // same candidate sets as exact x13 (identical cells), ranking
    // through 8-bit dequantized scores — near-identical neighbors
    def pairs(n: String) = SparkEntry.queries(n)(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("x13_ann_ivf")
    val sq = pairs("x51_ann_ivf_sq8")
    assert(sq.size == exact.size)
    val overlap = sq.count(exact.contains)
    assert(overlap >= sq.size - 4,
      s"ivf-sq8 overlap $overlap/${sq.size} vs exact in-cell")
  }

  test("x50 RRF fusion: every fused score is a sum of valid arm " +
    "contributions, ranks are dense, self is excluded") {
    val r = SparkEntry.queries("x50_rrf_fusion")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.length == 20 && r.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    // permitted values: one arm at rank 1..20, or two arms at any
    // rank pair — all integer-exact by construction
    val arm = (1 to 20).map(rk => 1000000L / (60 + rk)).toSet
    val both = (for (a <- arm; b <- arm) yield a + b)
    r.foreach { case (qid, doc, rrf, rn) =>
      assert(doc != qid)
      assert(arm.contains(rrf) || both.contains(rrf),
        s"($qid, $doc) rrf $rrf is not a valid arm sum")
      assert(rn >= 1 && rn <= 5)
    }
    r.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).toSeq.sorted == (1L to 5L),
        s"ranks not dense: ${g.toSeq}")
    }
  }

  test("x47 BM25: four corpus-drawn queries, five integer-exact-" +
    "scored results each, self excluded, positive scores") {
    val r = SparkEntry.queries("x47_bm25")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    assert(r.length == 20)
    r.foreach { case (qid, doc, bm25, rn) =>
      assert(doc != qid, s"query $qid retrieved itself")
      assert(bm25 > 0, s"($qid, $doc) non-positive score")
      assert(rn >= 1 && rn <= 5)
    }
    // ranks are dense and ordered by the integer score per query
    r.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to 5L),
        s"ranks not dense: ${g.toSeq}")
      assert(sorted.map(-_._3).toSeq == sorted.map(-_._3).sorted.toSeq,
        s"scores not descending: ${g.toSeq}")
    }
  }

  test("x70 PPJoin is LOSSLESS: prefix-filtered candidates recover " +
    "exactly the full inverted-index pair set, values included") {
    def rows(key: String) = SparkEntry.queries(key)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // the prefix-filtering principle guarantees candidate completeness
    // at Jaccard >= t (unlike x7's LSH or x68's sort locality, which
    // only recover the set on corpora where dups collide/sort close) —
    // so x70 must equal x6 EXACTLY, jaccard values and all (the x6
    // df-cap is a no-op at this corpus size)
    val pp = rows("x70_ppjoin")
    val idx = rows("x6_ngram_jaccard")
    assert(pp == idx, s"ppjoin ${pp.size} vs index ${idx.size}")
    assert(pp.nonEmpty)
  }

  test("x71 density pruning: per-cell prune counts match the ceil " +
    "contract and the pruned tail is the prototypical one") {
    val r = SparkEntry.queries("x71_density_prune")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3), x.getBoolean(4)))
    // the corpus partitions: every vector appears exactly once
    assert(r.map(_._1).distinct.length == r.length)
    r.groupBy(_._2).values.foreach { cell =>
      val n = cell.length
      val cut = math.ceil(n * 0.3).toLong
      // pruned = EXACTLY the rank prefix (the most prototypical rows)
      val pruned = cell.filter(!_._5)
      assert(pruned.length == cut, s"cell size $n pruned ${pruned.length}")
      assert(pruned.map(_._4).toSet == (1L to cut).toSet)
      // prototypicality direction: every pruned row scores >= every
      // kept row (up to rank ties broken by vec_id)
      val minPruned = pruned.map(_._3).min
      val kept = cell.filter(_._5)
      assert(kept.forall(_._3 <= minPruned),
        s"kept row more prototypical than a pruned one in cell ${cell.head._2}")
    }
  }

  test("x72 Min-K% prob: the worst-k tail mean never exceeds the " +
    "full-doc mean, over the same scored population as x36") {
    import spark.implicits._
    val mink = SparkEntry.queries("x72_mink_prob")(spark, dir)
      .select("doc_id", "mink_score").as[(Long, Double)].collect().toMap
    val lm = SparkEntry.queries("x36_lm_quality")(spark, dir)
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(mink.keySet == lm.keySet, "x72 and x36 score different docs")
    // mean of the bottom 20% <= mean of all bigrams; the two sides
    // round independently at 4, hence the 1e-4 slack
    mink.foreach { case (d, mk) =>
      assert(mk <= lm(d) + 1e-4, s"doc $d mink $mk > lm ${lm(d)}")
    }
    // and the tail is strictly harsher for at least most docs (equality
    // only when a doc's bigrams all score identically)
    assert(mink.count { case (d, mk) => mk < lm(d) } > mink.size / 2)
  }

  test("x69 retrieval eval: the dense IVF arm shows high graded " +
    "agreement with the exact ranking; NDCG stays in [0, 1e6] and " +
    "MRR/DCG vanish together") {
    val r = SparkEntry.queries("x69_retrieval_ndcg")(spark, dir)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.map(t => (t._1, t._2)).toSet ==
      (for (m <- Set("bm25", "ivf"); q <- 0L to 3L) yield (m, q)))
    r.foreach { case (m, q, dcg, ndcg, rr) =>
      assert(ndcg >= 0 && ndcg <= 1000000L, s"($m,$q) ndcg $ndcg")
      assert((dcg == 0) == (rr == 0), s"($m,$q) dcg $dcg rr $rr")
    }
    // the IVF arm ranks by TRUE cosine within the probed cell, so its
    // graded agreement with the exact order is high by construction
    // (measured 829k-1000k ppm on this corpus; floor leaves headroom)
    r.filter(_._1 == "ivf").foreach { case (_, q, _, ndcg, rr) =>
      assert(ndcg >= 700000L, s"ivf q$q ndcg $ndcg")
      assert(rr == 1000000L, s"ivf q$q rr $rr")
    }
  }

  test("x75 WAND pruning is LOSSLESS: the pruned top-k rows equal " +
    "x47's exactly, and the upper-bound prune fires on every query") {
    val wand = SparkEntry.queries("x75_bm25_wand")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    val full = SparkEntry.queries("x47_bm25")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSet
    // identical (qid, doc, score, rank) rows — θ0 ≤ θ_true and
    // ubsum ≥ score guarantee no true top-k doc is ever pruned
    assert(wand.map(t => (t._1, t._2, t._3, t._4)).toSet == full)
    // the prune is real work saved, not a no-op: every query drops a
    // nonzero slice of its candidates before the rank exchange
    wand.groupBy(_._1).foreach { case (qid, g) =>
      val (cand, pruned) = (g.head._5, g.head._6)
      assert(g.forall(t => t._5 == cand && t._6 == pruned))
      assert(pruned > 0 && pruned < cand,
        s"q$qid pruned $pruned of $cand")
    }
  }

  test("x73 DSIR weights score only the raw pool, and keep is exactly " +
    "the positive-weight slice") {
    val r = SparkEntry.queries("x73_dsir_weights")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3)))
    assert(r.nonEmpty)
    r.foreach { case (doc, nTok, w, keep) =>
      assert(doc % 10 != 0, s"reference doc $doc scored itself")
      assert(nTok > 0)
      assert(keep == (w > 0), s"doc $doc keep/weight disagree")
    }
    // the target slice pulls SOME docs above the pool (nonempty keeps)
    // without passing everything — the resampling signal exists
    val keeps = r.count(_._4)
    assert(keeps > 0 && keeps < r.length, s"keeps $keeps of ${r.length}")
  }

  test("x74 NB classifier: scores exactly the held-out docs, predicts " +
    "only trained classes, and beats chance on lang") {
    import graft.functions.{TextExprs => T}
    import spark.implicits._
    val r = SparkEntry.queries("x74_nb_classifier")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getBoolean(4)))
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"lang", T.wsTokens(lower($"text")).as("tk"),
        T.splitOf($"doc_id").as("sp"))
    val held = docs.filter($"sp" =!= "train" && size($"tk") > 0)
      .select($"doc_id").as[Long].collect().toSet
    val trainLangs = docs.filter($"sp" === "train")
      .select($"lang").distinct().as[String].collect().toSet
    assert(r.map(_._1).toSet == held, "scored set != held-out set")
    r.foreach { case (d, actual, pred, correct) =>
      assert(trainLangs.contains(pred), s"doc $d predicted unseen $pred")
      assert(correct == (actual == pred))
    }
    val acc = r.count(_._4).toDouble / r.length
    assert(acc > 1.0 / trainLangs.size + 0.05,
      s"accuracy $acc no better than chance over ${trainLangs.size}")
  }

  test("x76 top direction: unit-normalized output, exact integer mean, " +
    "and a 17th power round no longer moves the direction") {
    val r = SparkEntry.queries("x76_embed_topdir")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 64 && r.map(_._1).toSet == (0L to 63L).toSet)
    assert(r.map(t => math.abs(t._3)).max == 10000L,
      "direction not normalized to +/-10000")
    // mean replay: mu_milli is floor(sum/n + 0.5) of the milli-quantized
    // components, recomputed here independently from the raw parquet
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val mu = Array.tabulate(64) { i =>
      val s = vecs.map(v => math.round(v(i) * 1000)).sum
      math.floor(s * 1.0 / n + 0.5).toLong
    }
    assert(r.sortBy(_._1).map(_._2).toSeq == mu.toSeq, "mean mismatch")
    // convergence: the 16-round direction and the 17-round direction are
    // the same ray (deterministic corpus — pinned, not flaky)
    val w17 = graft.queries.VectorOps.topDirection(spark, dir, iters = 17)
      .collect().map(x => (x.getLong(0), x.getLong(2))).sortBy(_._1)
      .map(_._2.toDouble)
    val w16 = r.sortBy(_._1).map(_._3.toDouble)
    val cos = w16.lazyZip(w17).map(_ * _).sum /
      (math.sqrt(w16.map(x => x * x).sum) *
        math.sqrt(w17.map(x => x * x).sum))
    assert(cos >= 0.999, s"power iteration not converged: cos $cos")
  }

  test("x77 post-processed vectors are EXACTLY orthogonal to the " +
    "removed direction, and the search output is well-formed") {
    val (_, w) = VectorOps.topDirStats(spark, dir)
    val vp = VectorOps.postprocessed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(vp.length == 500)
    // v' . w == 0 exactly: the components are exact longs stored in
    // doubles, so the BigInt replay is the true integer dot product
    vp.foreach { case (id, v) =>
      val dotW = v.lazyZip(w).map((x, wi) =>
        BigInt(x.toLong) * BigInt(wi)).sum
      assert(dotW == 0, s"vec $id residual projection $dotW")
      assert(v.forall(x => x == math.rint(x)), s"vec $id non-integer")
    }
    val r = SparkEntry.queries("x77_abtt_search")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3)))
    assert(r.length == 40)
    assert(r.map(_._1).toSet == (0L to 7L).toSet)
    r.foreach { case (qid, nid, _, rn) =>
      assert(nid != qid); assert(rn >= 1 && rn <= 5)
    }
  }

  test("x79 multi-probe LSH only widens the x11 candidate set: every " +
    "single-probe query keeps a best neighbor at least as close") {
    val mp = SparkEntry.queries("x79_lsh_multiprobe")(spark, dir)
      .collect().filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sp = graft.queries.VectorOps.annLsh(spark, dir).collect()
      .filter(_.getLong(0) < 8)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the own bucket is always probed, so x11's candidates are a
    // subset: every x11-answerable query is answerable and its rank-1
    // cosine can only improve
    sp.keySet.foreach { q =>
      assert(mp.contains(q), s"query $q lost its own bucket")
      assert(mp(q) >= sp(q), s"query $q regressed: ${mp(q)} < ${sp(q)}")
    }
    // and the extra probes actually recover something on this corpus
    assert(mp.size >= sp.size)
    assert(mp.exists { case (q, c) => !sp.contains(q) || c > sp(q) },
      "multi-probe never improved any query")
  }

  test("x80 binary codes carry signal: Hamming ranks are monotone and " +
    "every best neighbor sits well below the random-code expectation") {
    val r = SparkEntry.queries("x80_ann_binary")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.length == 24 && r.map(_._1).toSet == (0L to 7L).toSet)
    r.foreach { case (qid, nid, ham, _) =>
      assert(nid != qid); assert(ham >= 0 && ham <= 64) }
    r.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._4)
      assert(s.map(_._4).toSeq == (1L to 3L))
      assert(s.map(_._3).toSeq == s.map(_._3).sorted.toSeq,
        s"hamming not monotone in rank: $s")
      // random 64-bit codes expect Hamming 32 (sd 4); a signal-bearing
      // sign code keeps the best neighbor several sd below that
      assert(s.head._3 < 28, s"rank-1 hamming ${s.head._3} ~ random")
    }
  }

  test("x82 IVF-binary with one cell degenerates to the flat x80 " +
    "search exactly, and the default-cell search is well-formed") {
    val flat = SparkEntry.queries("x80_ann_binary")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val one = graft.queries.VectorOps.annIvfBinary(spark, dir, cells = 1)
      .collect().map(_.toSeq).toSeq
    assert(one == flat, "cells=1 is not the flat binary search")
    val ivf = SparkEntry.queries("x82_ann_ivf_binary")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(ivf.map(_._1).toSet == (0L to 7L).toSet)
    ivf.foreach { case (qid, nid, ham, rn) =>
      assert(nid != qid); assert(ham >= 0 && ham <= 64)
      assert(rn >= 1 && rn <= 3)
    }
    // in-cell Hamming can only be >= the flat corpus-wide minimum
    val flatBest = flat.groupBy(_.head).view
      .mapValues(_.map(_(2).asInstanceOf[Long]).min).toMap
    ivf.filter(_._4 == 1).foreach { case (qid, _, ham, _) =>
      assert(ham >= flatBest(qid), s"q$qid in-cell beat the corpus") }
  }

  test("x83 JSD matrix: all source pairs, values inside [0, ln2], " +
    "and near-identical distributions sit near zero") {
    val r = SparkEntry.queries("x83_source_divergence")(spark, dir)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val sources = (r.map(_._1) ++ r.map(_._2)).toSet
    assert(r.length == sources.size * (sources.size - 1) / 2,
      s"${r.length} pairs for ${sources.size} sources")
    r.foreach { case (s1, s2, j) =>
      assert(s1 < s2)
      // JSD in nats is bounded by ln 2 = 0.693147...; the micro-nat
      // integerization can overshoot by at most B rounding half-ulps
      val bb = graft.queries.SelectOps.B
      assert(j >= -bb && j <= 693148 + bb, s"($s1, $s2) jsd $j")
    }
  }

  test("x84 curriculum: the emitted prefix is EXACTLY the global " +
    "virtual-time bottom-200, and sources land near their x54 shares") {
    import graft.functions.{TextExprs => T}
    import spark.implicits._
    val r = SparkEntry.queries("x84_curriculum")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.map(_._1).toSeq.sorted == (1L to 200L), "positions not dense")
    assert(r.map(_._2).distinct.length == 200, "duplicate docs")
    // exact replay: recompute every doc's virtual time and take the
    // true global bottom-200 — TakeOrdered must agree with it
    val shares = graft.queries.TextOps.mixtureShares(spark, dir)
      .select($"source", $"share6").as[(String, Long)].collect().toMap
    val vts = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source",
        T.md5Long(concat($"doc_id".cast("string"), lit("_cur")))
          .as("key"))
      .as[(Long, String, Long)].collect()
      .map { case (d, src, key) => (key * 1.0 / shares(src), d, src) }
    val want = vts.sortBy(t => (t._1, t._2)).take(200)
      .zipWithIndex.map { case ((_, d, src), i) => (i + 1L, d, src) }
    assert(r.sortBy(_._1).toSeq == want.toSeq, "prefix != true bottom-200")
    // interleave fidelity: each source's prefix count stays within
    // 3 sigma of its share's expectation
    val bySrc = r.groupBy(_._3).view.mapValues(_.length).toMap
    shares.foreach { case (src, s6) =>
      val exp = 200.0 * s6 / 1e6
      val got = bySrc.getOrElse(src, 0).toDouble
      assert(math.abs(got - exp) <= 3 * math.sqrt(exp) + 1,
        s"$src got $got expected $exp")
    }
  }

  test("x81 pigeonhole candidates are LOSSLESS: band-equi pairs " +
    "recover the brute-force Hamming<=3 pair set exactly") {
    val r = SparkEntry.queries("x81_simhash_dedup")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val hashes = graft.queries.TextOps.simhashed(spark, dir, bits = 32)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val brute = (for {
      (d1, h1) <- hashes; (d2, h2) <- hashes if d1 < d2
      ham = java.lang.Long.bitCount(h1 ^ h2) if ham <= 3
    } yield (d1, d2, ham.toLong)).toSet
    assert(r.toSet == brute,
      s"${(brute -- r.toSet).size} missed, ${(r.toSet -- brute).size} extra")
    assert(r.nonEmpty)
  }

  test("deep PageRank: checkpointed lineage is bit-identical to the " +
    "unbroken loop at 12 rounds — the driver-cost discipline for " +
    "deep iteration") {
    import spark.implicits._
    def ranks(ckpt: Int): Map[Long, Long] =
      graft.queries.EventOps.pagerank(spark, dir, iters = 12,
          checkpointEvery = ckpt)
        .as[(Long, Long)].collect().toMap
    val plain = ranks(0)
    val chk = ranks(5)
    assert(plain.nonEmpty)
    assert(chk == plain, "checkpointing changed the ranks")
  }

  test("x78 label propagation: every community label is one of its " +
    "members, labels come from the graph, and sizes add up") {
    import spark.implicits._
    val r = SparkEntry.queries("x78_label_prop")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val nodes = graft.queries.EventOps.coEdges(spark, dir)
      .select($"src").distinct().as[Long].collect().toSet
    assert(r.map(_._1).toSet == nodes, "labeled set != graph nodes")
    // labels are node ids from the same graph (propagation never
    // invents a label)
    assert(r.map(_._2).toSet.subsetOf(nodes))
    // community_size is consistent with the actual label multiplicity
    val sizes = r.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    r.foreach { case (u, c, sz) =>
      assert(sz == sizes(c), s"user $u community $c size $sz") }
    // propagation actually merged communities: fewer labels than nodes
    assert(sizes.size < nodes.size, s"${sizes.size} of ${nodes.size}")
  }

  test("Misra-Gries buffer stays bounded at k under 20k distinct keys " +
    "and never loses a key above the n/(k+1) guarantee") {
    import spark.implicits._
    // hot keys far above the k=8 guarantee threshold, drowned in
    // 20,000 singletons that must cycle through the 8 slots
    val data = Seq.fill(8000)("hot1") ++ Seq.fill(6000)("hot2") ++
      Seq.fill(5000)("hot3") ++ (0 until 20000).map(i => s"cold$i")
    val n = data.length
    assert(Seq(8000, 6000, 5000).forall(_ > n / 9), "test data miscalibrated")
    val ds = spark.createDataset(
      spark.sparkContext.parallelize(data, 16)).toDF("w")
    val m = ds.agg(graft.functions.MisraGries.udaf(8)($"w"))
      .head().getMap[String, Long](0)
    assert(m.size <= 8, s"state ${m.size} > k")
    assert(Set("hot1", "hot2", "hot3").subsetOf(m.keySet),
      s"guaranteed key lost: ${m.keySet}")
    // counts are lower bounds, never overcounts
    assert(m("hot1") <= 8000 && m("hot2") <= 6000 && m("hot3") <= 5000)
    // and the x89 registry output is the EXACT answer on the corpus
    val r = SparkEntry.queries("x89_heavy_hitters")(spark, dir)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.nonEmpty && r.length <= 32)
    val counts = r.map(_._2)
    assert(counts.toSeq == counts.sortBy(-_).toSeq, "not sorted by count")
  }

  test("x88 coverage gates: covered-chars never exceed doc chars, " +
    "duplication is rarer than a top gram, and both gates fire") {
    val r = SparkEntry.queries("x88_gopher_coverage")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getBoolean(4)))
    assert(r.length == 500)
    r.foreach { case (id, chars, top2, dupn, keep) =>
      assert(chars > 0)
      // coverage counts each char at most once: bounded by the doc
      assert(dupn >= 0 && dupn <= 1000000L, s"doc $id dupn $dupn")
      assert(top2 >= 0, s"doc $id top2 $top2")
      assert(keep == (top2 < 200000L && dupn < 150000L), s"doc $id")
    }
    // the corpus exercises both sides of the gate
    assert(r.exists(!_._5), "no doc fails the gates")
    assert(r.count(_._5) > r.length / 2, "most docs should pass")
    // duplicated n-grams exist but are the minority signal
    assert(r.exists(_._4 > 0), "no doc has a duplicated n-gram")
    assert(r.count(_._4 > 0) < r.length / 2)
  }

  test("x94 burst detection: full trailing windows only, exact integer " +
    "test quantities consistent, and the 2-sigma alert rate is sane") {
    val r = SparkEntry.queries("x94_rate_anomaly")(spark, dir)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getBoolean(5)))
    assert(r.length == 720 - 24, s"${r.length} rows") // first day warms up
    r.foreach { case (h, c, s24, lhs, rhs, burst) =>
      val dev = 24 * c - s24
      assert(lhs == dev * dev * 23, s"$h lhs inconsistent")
      assert(burst == (lhs > rhs && dev > 0), s"$h burst flag inconsistent")
    }
    val bursts = r.count(_._6)
    assert(bursts > 0, "no bursts at 2 sigma over 696 hours — suspicious")
    assert(bursts < r.length / 10, s"$bursts bursts — threshold broken")
  }

  test("x93 cluster resolution keeps the genuinely best-quality member " +
    "of every x19 component, exactly once") {
    val res = SparkEntry.queries("x93_cluster_resolve")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3)))
    val comps = SparkEntry.queries("x19_components")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val quality = SparkEntry.queries("x2_quality")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getDouble(4))).toMap
    // one resolution per component, sizes consistent
    assert(res.map(_._1).toSet == comps.map(_._2).toSet)
    val sizes = comps.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    res.foreach { case (c, keep, q, n) =>
      assert(n == sizes(c), s"cluster $c size $n")
      // the keeper IS a member and its quality is the member max
      val members = comps.filter(_._2 == c).map(_._1)
      assert(members.contains(keep))
      assert(q == quality(keep))
      assert(members.forall(m => quality(m) <= q),
        s"cluster $c kept $keep but a better member exists")
    }
  }

  test("x91 filtered ANN: every neighbor satisfies the filter, ranks " +
    "never exceed the constrained candidate pool, and constrained " +
    "results are a subset of the unfiltered search's cell") {
    val r = SparkEntry.queries("x91_ann_filtered")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(4), x.getLong(5)))
    assert(r.nonEmpty)
    import spark.implicits._
    val labels = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)]
      .collect().toMap
    r.foreach { case (qid, lbl, nid, rn, nCand) =>
      assert(labels(nid) == lbl, s"q$qid neighbor $nid label mismatch")
      assert(labels(qid) == lbl, s"q$qid filter is not its own label")
      assert(rn <= math.min(3L, nCand), s"q$qid rank $rn > pool $nCand")
    }
    // the filtered-recall hazard is real on this corpus: some query's
    // constrained cell cannot fill k (that is WHY n_cand is reported)
    assert(r.groupBy(_._1).exists(_._2.length < 3),
      "every filtered query filled k — n_cand column proves nothing")
  }

  test("x95 nprobe widens every filtered pool: per-query candidates " +
    "dominate x91's and under-filled queries recover") {
    def pools(k: String) = SparkEntry.queries(k)(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(4), x.getLong(5)))
    val p91 = pools("x91_ann_filtered")
    val p95 = pools("x95_ann_filtered_probe")
    val c91 = p91.groupBy(_._1).view.mapValues(_.head._3).toMap
    val c95 = p95.groupBy(_._1).view.mapValues(_.head._3).toMap
    assert(c91.keySet.subsetOf(c95.keySet), "a query lost its results")
    c91.foreach { case (q, n) =>
      assert(c95(q) >= n, s"query $q pool shrank: ${c95(q)} < $n") }
    val unfilled91 = p91.groupBy(_._1).count(_._2.length < 3)
    val unfilled95 = p95.groupBy(_._1).count(_._2.length < 3)
    assert(unfilled91 > 0, "x91 has no under-filled query to fix")
    assert(unfilled95 < unfilled91,
      s"nprobe=2 recovered nothing ($unfilled95 vs $unfilled91)")
  }

  test("x96 grouped HLL estimates every group within the m=256 error " +
    "regime with bounded per-group registers") {
    val r = SparkEntry.queries("x96_hll_by_group")(spark, dir)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    assert(r.nonEmpty)
    r.foreach { case (t, n, occ, zeros, est) =>
      assert(occ + zeros == 256, s"$t register accounting")
      assert(occ <= n, s"$t more occupied buckets than members")
      assert(math.abs(est - n) / n < 0.25, s"$t est $est vs exact $n")
    }
  }

  test("x92 kNN classification beats chance overall and reports every " +
    "class exactly once") {
    val r = SparkEntry.queries("x92_knn_classify")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.map(_._1).toSeq == r.map(_._1).sorted.toSeq)
    assert(r.map(_._1).distinct.length == r.length)
    val (n, correct) = (r.map(_._2).sum, r.map(_._3).sum)
    assert(n == 500, s"classified $n of 500")
    // the synthetic labels are geometry-INDEPENDENT, so the honest
    // reading is chance (~10% over 10 balanced classes) — the report's
    // value is that it detects exactly that; pin the chance band so a
    // voting bug (constant prediction, self-inclusion) can't hide
    val accPpm = correct * 1000000L / n
    assert(accPpm > 30000L && accPpm < 300000L,
      s"accuracy $accPpm ppm outside the chance band for random labels")
    r.foreach { case (lbl, cn, cc, ppm) =>
      assert(ppm == cc * 1000000L / cn, s"class $lbl ppm mismatch") }
  }

  test("x85 removal lineage is EXACTLY the complement of x49's " +
    "survivor set, and every edge is a real in-cell pair at tau") {
    import spark.implicits._
    val edges = SparkEntry.queries("x85_semdedup_edges")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    assert(edges.nonEmpty, "no removals at tau on this corpus")
    val removed = edges.map(_._1).toSet
    val kept = SparkEntry.queries("x49_semantic_dedup")(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    val all = graft.queries.VectorOps
      .normalizedEmbeddings(spark, dir).select($"vec_id")
      .as[Long].collect().toSet
    // the two registry views partition the corpus
    assert(removed.intersect(kept).isEmpty)
    assert(removed.union(kept) == all)
    edges.foreach { case (vid, _, anchor, cos) =>
      assert(anchor < vid, s"anchor $anchor !< removed $vid")
      assert(cos >= graft.queries.VectorOps.SemDedupTau, s"$vid cos $cos")
    }
  }

  test("x86 k-NN graph restricted to the x13 query set reproduces the " +
    "x13 search EXACTLY, and ranks are well-formed") {
    val g = SparkEntry.queries("x86_knn_graph")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3)))
    // well-formed: contiguous ranks, cosine monotone within src
    g.groupBy(_._1).foreach { case (src, rows) =>
      val s = rows.sortBy(_._4)
      assert(s.map(_._4).toSeq == (1L to s.length).toSeq, s"src $src")
      assert(s.map(_._3).toSeq == s.map(_._3).sortBy(-_).toSeq,
        s"src $src cos not monotone")
    }
    // x13 is the same in-cell search with queries = vec_id < 8, k = 3
    val x13 = SparkEntry.queries("x13_ann_ivf")(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3))).toSet
    val gSub = g.filter(e => e._1 < 8 && e._4 <= 3).toSet
    assert(gSub == x13, "x86 restricted to x13's queries diverges")
  }

  test("x87 NN-descent round never loses quality per rank and strictly " +
    "improves recall against the exact graph on this corpus") {
    val before = SparkEntry.queries("x86_knn_graph")(spark, dir)
      .collect().map(x => ((x.getLong(0), x.getLong(3)),
        (x.getLong(1), x.getDouble(2))))
    val after = SparkEntry.queries("x87_nn_descent")(spark, dir)
      .collect().map(x => ((x.getLong(0), x.getLong(3)),
        (x.getLong(1), x.getDouble(2))))
    val beforeM = before.toMap
    // candidate superset per src => per-rank cosine can only improve
    after.foreach { case ((src, rn), (_, cos)) =>
      beforeM.get((src, rn)).foreach { case (_, cos0) =>
        assert(cos + 1e-12 >= cos0, s"src $src rank $rn: $cos < $cos0") }
    }
    // recall vs the EXACT k-NN graph (brute force over the corpus)
    val n = graft.queries.VectorOps.normalizedEmbeddings(spark, dir)
      .cache()
    val n2 = n.select(org.apache.spark.sql.functions.col("vec_id")
      .as("vec_id2"), org.apache.spark.sql.functions.col("v").as("v2"))
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val exact = n.crossJoin(n2)
      .filter(col("vec_id") =!= col("vec_id2"))
      .select(col("vec_id").as("src"), col("vec_id2").as("dst"),
        round(graft.queries.VectorOps.dot(col("v"), col("v2")), 4)
          .as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn") <= graft.queries.VectorOps.KnnGraphK)
      .select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    n.unpersist()
    val hitsBefore = before.map { case ((src, _), (dst, _)) =>
      exact((src, dst)) }.count(identity)
    val hitsAfter = after.map { case ((src, _), (dst, _)) =>
      exact((src, dst)) }.count(identity)
    assert(hitsAfter >= hitsBefore, s"$hitsAfter < $hitsBefore")
    assert(hitsAfter > hitsBefore,
      s"2-hop round found nothing new ($hitsAfter = $hitsBefore)")
  }

  test("eager Scaled graph wrappers release every in-body cache and " +
    "return the same rows as their lazy twins") {
    // the lazy registry bodies pin frames their lazy results reference
    // (the bench evicts per query); the Eager wrappers are for callers
    // LOOPING rounds in a long-lived session — after a call the cache
    // manager must hold nothing, or each iteration leaks three pins
    spark.catalog.clearCache()
    val eager = VectorOps.nnDescentRoundScaledEager(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(eager.nonEmpty)
    assert(spark.sharedState.cacheManager.isEmpty,
      "nnDescentRoundScaledEager left cached frames behind")
    val lazyRows = VectorOps.nnDescentRoundScaled(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(eager == lazyRows, "eager variant diverged from lazy twin")
    spark.catalog.clearCache()
    val g = VectorOps.knnGraphScaledEager(spark, dir)
    assert(g.count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "knnGraphScaledEager left cached frames behind")
    // the walk bodies got the same treatment: a corpus-generating
    // loop (the embedding-training shape) must not pin the
    // assignment + ranked-edge frames once per call
    spark.catalog.clearCache()
    def walkRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    val we = walkRows(VectorOps.graphWalksEager(spark, dir))
    assert(we.nonEmpty)
    assert(spark.sharedState.cacheManager.isEmpty,
      "graphWalksEager left cached frames behind")
    assert(we == walkRows(VectorOps.graphWalks(spark, dir)),
      "eager walks diverged from lazy twin")
    spark.catalog.clearCache()
    val n2 = walkRows(VectorOps.node2vecWalksEager(spark, dir))
    assert(n2.nonEmpty)
    assert(spark.sharedState.cacheManager.isEmpty,
      "node2vecWalksEager left cached frames behind")
    assert(n2 == walkRows(VectorOps.node2vecWalks(spark, dir)),
      "eager node2vec walks diverged from lazy twin")
  }

  test("x107 leakage resolution: lower-precedence members drop once, " +
    "same-split pairs untouched, manifest consistent with x55 + x59") {
    import spark.implicits._
    import graft.queries.TextOps
    // synthetic: pairs crossing each boundary kind + one same-split
    val rel = Seq((1L, "train"), (2L, "test"), (3L, "val"),
      (4L, "train"), (5L, "test"), (6L, "val"), (7L, "train"),
      (8L, "train")).toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (2L, 5L))
      .toDF("d1", "d2")
    val kept = TextOps.resolveLeakage(rel, pairs)
      .collect().map(_.getLong(0)).toSet
    // (1 train, 2 test) -> drop 2; (3 val, 4 train) -> drop 3;
    // (5 test, 6 val) -> drop 5; (7,8) same split -> keep both;
    // (2,5) both already dropped, same split anyway
    assert(kept == Set(1L, 4L, 6L, 7L, 8L))
    // the real manifest: a subset of x55's survivors, split-stamped
    // identically to x59's rule, and (on this corpus) drop-free
    // because exact dedup already collapsed the near-dup pairs
    val m = SparkEntry.queries("x107_release_manifest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val prep = SparkEntry.queries("x55_corpus_prep")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(m.map(_._1).toSet.subsetOf(prep))
    val splits = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextExprs.splitOf(col("doc_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    m.foreach { case (d, s) => assert(splits(d) == s, s"doc $d") }
  }

  test("x103 session corpus shares e2's session boundary exactly; " +
    "x104 novelty stays in ppm bounds with both regimes present") {
    // every (user, session) in the corpus export is an e2 session with
    // the same event count — the two surfaces share one boundary
    val corp = SparkEntry.queries("x103_session_corpus")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val sess = SparkEntry.queries("e2_sessionize")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(corp.toMap == sess.toMap,
      "session-corpus boundary drifted from e2")
    // and the text length is consistent with the token count
    SparkEntry.queries("x103_session_corpus")(spark, dir)
      .collect().take(200).foreach { r =>
        assert(r.getString(3).split(" ").length == r.getLong(2)) }
    val nov = SparkEntry.queries("x104_novelty")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(nov.length > 100)
    nov.foreach { case (d, n, novel, ppm) =>
      assert(novel <= n && ppm >= 0 && ppm <= 1000000L, s"doc $d")
      assert(ppm == novel * 1000000L / n, s"doc $d ppm") }
    // the corpus has both regimes: near-dups of ref docs (low novelty)
    // and genuinely new content (high)
    assert(nov.exists(_._4 < 300000L), "no low-novelty docs")
    assert(nov.exists(_._4 > 700000L), "no high-novelty docs")
  }

  test("x101 drift monitor: unbiased slice reads clean, topical cap " +
    "fires, every batch count is a subset of its cell's population") {
    val rows = SparkEntry.queries("x101_ann_drift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5), r.getBoolean(6)))
    val bySlice = rows.groupBy(_._1)
    assert(bySlice.keySet === Set("uniform_third", "topical_cap"))
    bySlice.foreach { case (_, rs) =>
      assert(rs.length == 16) // dense cell support
      assert(rs.map(_._5).distinct.length == 1) // one total per slice
      rs.foreach { case (_, _, cRef, cNew, _, _) =>
        assert(cNew <= cRef, s"batch count $cNew > population $cRef") }
    }
    assert(!bySlice("uniform_third").head._6,
      "unbiased slice flagged as drift")
    assert(bySlice("topical_cap").head._6,
      "concentrated slice not flagged")
    // the gap is wide, not marginal: an order apart around the level
    val ju = bySlice("uniform_third").head._5
    val jt = bySlice("topical_cap").head._5
    assert(jt > 3 * ju, s"drift $jt vs clean $ju too close")
  }

  test("x100 containment candidates are LOSSLESS: prefix-probe pairs " +
    "recover the brute-force containment pair set exactly") {
    import org.apache.spark.sql.functions._
    val small = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x100_containment")(spark, small)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every ordered pair, full-array intersection, same
    // integer threshold — affordable only at this SF, which is the point
    val tk = Tables(spark, small, "documents")
      .select(col("doc_id"),
        graft.functions.TextExprs.wsTokens(col("text")).as("tks"))
      .filter(size(col("tks")) >= 3)
      .select(col("doc_id"), transform(
        graft.functions.TextExprs.shingles(col("tks"), 3),
        x => graft.functions.TextExprs.md5Long(x)).as("hs"))
    val brute = tk.toDF("d1", "h1")
      .crossJoin(tk.toDF("d2", "h2"))
      .filter(col("d1") =!= col("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("h1"), col("h2"))).cast("long").as("i"),
        size(col("h1")).cast("long").as("na"))
      .filter(col("i") * 10 >= col("na") * 7)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"missed ${(brute -- got).take(5)}, extra ${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "no containment pairs at sf0.001")
  }

  test("x98 triangles: orientation counts each triangle once — per-node " +
    "sums divisible by 3, counts wedge-bounded, lcc within [0, 1e6]") {
    val rows = SparkEntry.queries("x98_triangles")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length > 100)
    // every triangle contributes exactly 1 to exactly 3 nodes
    assert(rows.map(_._3).sum % 3 == 0)
    assert(rows.exists(_._3 > 0), "no triangles on the sf0.01 graph")
    rows.foreach { case (u, deg, tri, lcc) =>
      assert(tri <= deg * (deg - 1) / 2,
        s"user $u: $tri triangles > wedge bound for deg $deg")
      assert(lcc >= 0 && lcc <= 1000000L, s"user $u: lcc $lcc")
      // closed fraction consistency: ppm recomputed from (tri, deg)
      val expect = if (deg >= 2) 2000000L * tri / (deg * (deg - 1)) else 0L
      assert(lcc == expect, s"user $u: $lcc != $expect")
    }
  }

  test("embedding trainer prefix stability: a d=4 train's first two " +
    "columns are IDENTICAL to the d=2 train — added dims only refine") {
    import spark.implicits._
    // a small pair relation with genuine co-occurrence structure (the
    // trainer accepts any (center, context, n) frame — the walk chain
    // is not what's under test here). Block-diagonal so within-block
    // PMI ≈ ln 10.7 clears the SPPMI shift (near-uniform pairs all
    // fall below it and train an empty vocabulary).
    val pairs = (for {
      a <- 0L until 32L; b <- 0L until 32L
      if a != b && a / 4 == b / 4
    } yield (a, b, 10L + (a * 3 + b) % 4)).toDF("center", "context", "n")
    val d2 = VectorOps.trainNodeEmbeddings(spark, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val d4 = VectorOps.trainNodeEmbeddings(spark, pairs, dims = 4)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2)), (r.getLong(3), r.getLong(4))))
    assert(d4.nonEmpty && d4.length == d2.size)
    // dim j never feeds back into dims < j: matvec is per-dim, the
    // ladder only orthogonalizes j against i < j — so (w1, w2) must
    // be bit-identical between the two trains
    d4.foreach { case (node, w12, _) =>
      assert(d2(node) == w12,
        s"node $node: d=4 (w1,w2)=$w12 != d=2 ${d2(node)}")
    }
    // and the added dims are genuine new signal, not copies or zeros:
    // renormalization targets max-abs 10000 on a non-degenerate dim
    assert(d4.exists { case (_, _, (w3, w4)) => w3 != 0L || w4 != 0L },
      "d=4 trained degenerate extra dims")
    assert(d4.map(_._3._1).max == 10000L ||
      d4.map(_._3._1).min == -10000L, "w3 not renormalized to max-abs")
  }

  test("the batched d>2 ladder's driver-action count is pinned: d+1 " +
    "actions per round, not the step-at-a-time 2d+1") {
    import spark.implicits._
    // the d>2 trainer's wall clock is ACTION COUNT, not data (warm ≈
    // cold ≈ data-independent) — so the structural invariant worth
    // pinning is the scheduler-job count, which no weather can
    // inflate. AQE splits each driver action into several jobs
    // (broadcast + shuffle-stage materializations), so the pin is
    // calibrated empirically: the batched ladder (d+1 actions/round)
    // measures ~128 jobs end-to-end on this fixture; a revert to
    // per-(i,j)-step scalars (2d+1 actions/round) adds ~40 driver
    // actions (several jobs each under AQE) and lands well above it.
    val pairs = (for {
      a <- 0L until 32L; b <- 0L until 32L
      if a != b && a / 4 == b / 4
    } yield (a, b, 10L + (a * 3 + b) % 4)).toDF("center", "context", "n")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val dims = 4
      VectorOps.trainNodeEmbeddings(spark, pairs, dims = dims).collect()
      // listener events post asynchronously; drain the bus for real
      // (waitUntilEmpty is private[spark] = bytecode-public, so a
      // reflective call is exact where a sleep-until-stable loop can
      // exit mid-drain and undercount into a spurious pass)
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      val n = jobs.get()
      // budget anchored to the ladder's shape, not a bare constant:
      // (d+1) driver actions per round × EmbedIters rounds, ≤3 AQE
      // jobs per action (broadcast + shuffle-stage materializations),
      // + 40 for setup (checkpoint, init, final renorm/collect).
      // d=4: 3·5·8 + 40 = 160; measured ~128 on the batched shape. A
      // step-at-a-time revert is (2d+1) = 9 actions/round → ≥216
      // action jobs alone, well past the budget at every d.
      val budget = 3 * (dims + 1) * VectorOps.EmbedIters + 40
      assert(n <= budget, s"d=$dims train ran $n scheduler jobs " +
        s"(budget $budget = 3·(d+1)·iters + 40; batched shape " +
        "measures ~128) — the ladder regressed toward " +
        "step-at-a-time scalars")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("x107's plan fix is pinned STRUCTURALLY: the release-manifest " +
    "body executes within its stage budget — the one-hash-layout " +
    "shape, independent of box weather") {
    // The r12 fix collapsed three shingle-frame exchanges into one
    // repartition + shared cached distinct; a revert re-adds the
    // exchanges AND recomputes the distinct per consumer (measured as
    // 6-7 repeated full-width stages). Wall-clock cannot adjudicate
    // that on this box (the 3.5 s time pin flip-flops inside the
    // weather band), but STAGE COUNT is weather-immune: same data,
    // same config, same plan => same stages. Budget = measured + 4 —
    // tight enough that the revert's +6 stages trip it, loose enough
    // for AQE's small run-to-run variance.
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = stages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      graft.SparkEntry.queries("x107_release_manifest")(
        spark, "/root/testdata/sf0.001").count()
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      val n = stages.get()
      assert(n <= 40 && n >= 15,
        s"x107 ran $n stages (budget 40; the one-layout shape " +
          "measures ~35-36) — a structural plan regression, not " +
          "weather: re-audit the shingle-frame exchanges")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("x135's peel is pinned STRUCTURALLY: linear stages per round " +
    "(the lazy-localCheckpoint shape), never the 2^R branched plan") {
    // Each peel round's degree frame feeds BOTH the removals and the
    // next survivor set; without the per-round localCheckpoint(false)
    // the logical plan embeds the prior round twice per round (~14k
    // plan nodes measured, 41 s wall on data DuckDB handles in 0.1 s
    // — all driver-side Catalyst walking). Stage count is the
    // weather-immune witness: the checkpointed shape is linear in R.
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = stages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = graft.SparkEntry.queries("x135_kcore_peel")(
        spark, "/root/testdata/sf0.001")
      // the direct witness of the checkpoint: the LOGICAL plan is a
      // few RDD leaves, not the 2^R-embedded tree (which measures
      // megabytes of treeString before Catalyst even starts) — this
      // catches a cache()-only regression, whose STAGE count would
      // stay modest while the driver planning wall explodes
      val planChars = df.queryExecution.logical.treeString.length
      assert(planChars < 100000,
        s"x135 logical plan is $planChars chars — the per-round " +
          "localCheckpoint(false) truncation is gone (branched shape " +
          "measures ~14k plan NODES); re-audit the peel loop")
      df.count()
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      val n = stages.get()
      // measured 17 on the checkpointed shape; an uncheckpointed,
      // uncached peel recomputes the pair-join base per consumer and
      // multiplies stages several-fold
      assert(n <= 28 && n >= 8,
        s"x135 ran $n stages (budget 28; the checkpointed linear " +
          "shape measures ~17) — a structural peel regression, not " +
          "weather")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
