package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit (the 100 TB checklist): filters push to the
  * parquet scan, projections prune the read schema, small sides
  * broadcast, and the big fact join is the only shuffle. Asserted on
  * plan text so a regression in plan shape fails CI, not just slows
  * the bench.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE finalizes
    df.queryExecution.executedPlan.toString
  }

  /** Only the AQE final plan section — the adaptive plan string repeats
    * every operator under "== Initial Plan ==", which double-counts
    * scans/exchanges in occurrence assertions. */
  private def finalPlanOf(name: String): String =
    planOf(name).split("== Initial Plan ==")(0)

  test("s5_scan pushes the filter into the parquet scan and prunes columns") {
    val p = planOf("s5_scan")
    assert(p.contains("PushedFilters: [IsNotNull(p_size), " +
      "GreaterThanOrEqual(p_size,25)]"), p)
    // projection reaches the scan: only the 3 selected columns are read
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && readSchema.contains("p_size")
      && readSchema.contains("p_brand") && !readSchema.contains("p_name"),
      readSchema)
  }

  test("f1_filter pushes all three predicates to the scan") {
    val p = planOf("f1_filter")
    // plan text truncates the filter list; the per-column IsNotNulls
    // prove each predicate reached the scan's PushedFilters
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse("")
    assert(pushed.contains("IsNotNull(l_shipdate)"), pushed)
    assert(pushed.contains("IsNotNull(l_discount)"), pushed)
    assert(pushed.contains("IsNotNull(l_quantity)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_shipda"), pushed)
  }

  test("flagship plan broadcasts all three dims; one shuffled fact join") {
    val df = SparkEntry.entry(spark)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins:\n$p")
    // lineitem join orders may itself broadcast at sf0.001 under AQE;
    // what must NOT happen is a cartesian or nested-loop fact join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x9 KNN broadcasts the query side, never shuffles the corpus") {
    val p = planOf("x9_cosine_knn")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // the codegen dot product is in the plan (not an interpreted fold)
    assert(p.contains("dot_product"), p)
  }

  test("j1 join broadcasts the dimension side") {
    val p = planOf("j1_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x13 IVF assigns cells without shuffling the corpus and " +
    "broadcasts the probe side") {
    val p = planOf("x13_ann_ivf")
    // cell assignment is a literal-folded projection: the quantizer
    // must NOT appear as a join against a centroid relation
    assert(!p.contains("CartesianProduct"), p)
    // the probe (query) side broadcasts into the cell-equality join
    assert(p.contains("BroadcastHashJoin"), p)
    // exact refine uses the codegen dot product
    assert(p.contains("dot_product"), p)
  }

  test("x16 as-of join reads events once and shuffles once on user_id") {
    val p = finalPlanOf("x16_asof")
    // single scan: union-of-filters would scan the parquet twice
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    // the event-type IN filter reaches the scan
    assert(p.contains("In(event_type"), p)
    // exactly one exchange: the window partitioning on user_id (plus
    // the final global sort's range exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange:\n$p")
  }

  test("x17 packing is a single window over one shuffle on source") {
    val p = finalPlanOf("x17_pack")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("x22 weighted sample plans as TakeOrdered (no global sort)") {
    val p = finalPlanOf("x22_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    // a global Sort exchange would mean the whole table is sorted
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("x18 scrub is a pure projection: no exchange at all") {
    val p = finalPlanOf("x18_scrub")
    assert(!p.contains("Exchange hashpartitioning"), p)
    // only the final ORDER BY's range exchange is allowed
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("m4 fixed-weight scoring is one scan with no hash exchange") {
    val p = finalPlanOf("m4_score_fixed")
    // the whole forward pass (dot, bias, exp, normalize, argmax) is a
    // codegen'd projection; only the final ORDER BY exchanges
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("x29 nprobe probes broadcast the query side, never the corpus") {
    val p = finalPlanOf("x29_ann_nprobe")
    // the exploded-probe query side is the BUILD side of a broadcast
    // join on the cell key; the corpus feeds the streamed side with no
    // corpus-wide hash exchange before the join (the only qid exchange
    // is the per-query ranking window after candidate generation)
    assert(p.contains("BroadcastHashJoin [cell"), p)
    assert(p.contains("BuildRight"), p)
    assert(!p.contains("Exchange hashpartitioning(cell"), p)
  }

  test("a8 cube expands grouping sets before ONE aggregation exchange") {
    val p = finalPlanOf("a8_cube")
    assert(p.contains("Expand"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("a9 pivot with an explicit value list is one scan, no " +
    "values-discovery job") {
    val p = finalPlanOf("a9_pivot")
    // Spark plans pivot as (user,type)-count partial agg + pivotfirst
    // on user: two hash exchanges, both map-side combined. What the
    // explicit value list buys is NO separate distinct-values job and
    // no third exchange.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges:\n$p")
    assert(p.contains("pivotfirst"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("e6 transitions: lag window and pair agg share one exchange " +
    "chain, single scan") {
    val p = finalPlanOf("e6_transitions")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    // window on user_id + vocabulary-sized pair agg = 2 hash exchanges
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges:\n$p")
  }

  test("x24 chunker is generator-only: no hash exchange") {
    val p = finalPlanOf("x24_chunk")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("x25 mixture is a filtered generator: no hash exchange") {
    val p = finalPlanOf("x25_mixture")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("x26 contamination broadcasts the benchmark shingle index") {
    val p = finalPlanOf("x26_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x129 substr audit: exactly one per-doc window (the interval " +
    "merge), occurrence counting never sorts corpus-wide") {
    val p = finalPlanOf("x129_substr_dedup")
    assert(!p.contains("CartesianProduct"), p)
    // the lag-merge is the ONLY window — duplicated-window detection
    // must stay a hash aggregate, not a count() over a sorted window
    assert("Window \\[".r.findAllIn(p).length == 1, p)
  }

  test("x130 fuzzy decontam: candidates via band joins, benchmark side " +
    "broadcast, never a corpus×benchmark cartesian") {
    val p = finalPlanOf("x130_fuzzy_decontam")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x27 filter report is one scan into a 4-row aggregate") {
    val p = finalPlanOf("x27_filter_report")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange:\n$p")
  }

  test("x28 winnow: gram + winnow windows share one doc_id exchange") {
    val p = finalPlanOf("x28_winnow")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    // spread repartition + the doc_id window/agg partitioning; the two
    // window passes and the distinct agg must NOT add further exchanges
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges:\n$p")
    assert("Window".r.findAllIn(p).length >= 2, p)
  }

  test("x30 span dedup: content groupBy with map-side partial " +
    "aggregation, no window over occurrences") {
    val p = finalPlanOf("x30_span_dedup")
    // two logical exchanges (span content, then doc_id reassembly);
    // plus the spread fan-out
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 hash exchanges:\n$p")
    // the dedup must be the partial-agg min(struct) shape, not a
    // row_number window (which would shuffle every span occurrence)
    assert(p.contains("partial_min") || p.contains("partial min"), p)
    assert(!p.contains("row_number"), p)
  }

  test("x31 decontamination probes the bloom in a scan-side filter " +
    "before any join") {
    val p = finalPlanOf("x31_decontam_bloom")
    // the codegen probe appears as a filter condition on the corpus
    // scan side — the map-side prune that makes the 100 TB anti-join
    // shuffle only the maybe sliver
    assert(p.contains("bloom_might_contain"), p)
    // and the definite-clean branch reaches the union without a
    // shuffling join: exactly ONE hash/merge join in the whole plan
    // (the confirm anti-join) — the broadcast-nested-loop attach of
    // the lazy 1-row bloom build side doesn't count, it ships only
    // the bit array
    val joins = "Join LeftAnti".r.findAllIn(p).length +
      "SortMergeJoin".r.findAllIn(p).length +
      "BroadcastHashJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(joins == 1, s"expected exactly 1 join:\n$p")
    assert(p.contains("Union"), p)
  }

  test("x31 construction fires no extra Spark jobs beyond the scan " +
    "setup: the bloom build is lazy, not a construction-time action") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // the listener bus is async: drain it deterministically instead of
    // sleeping (private[spark] at the source level, public in
    // bytecode — reflection keeps the test off the knife's edge of a
    // loaded machine outrunning a fixed sleep)
    def drainBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val m = bus.getClass.getMethods
        .filter(_.getName == "waitUntilEmpty").minBy(_.getParameterCount)
      if (m.getParameterCount == 0) m.invoke(bus)
      else m.invoke(bus, java.lang.Long.valueOf(30000L))
      ()
    }
    def jobsDuring(f: => Unit): Int = {
      spark.sparkContext.addSparkListener(l)
      try {
        jobs.set(0)
        f
        drainBus()
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    // parquet schema inference fires one small job per spark.read —
    // the baseline performs the SAME number of table reads as x31
    // (corpus + benchmark list = two known-lazy constructions), so the
    // comparison is reads-for-reads, not one-vs-two (the old eager
    // build added a count + a head on top of its reads)
    val baseline = jobsDuring {
      SparkEntry.queries("x1_tokenize")(spark, dir)
      SparkEntry.queries("x1_tokenize")(spark, dir)
      ()
    }
    val x31 = jobsDuring {
      SparkEntry.queries("x31_decontam_bloom")(spark, dir)
      ()
    }
    assert(x31 <= baseline,
      s"x31 construction fired $x31 jobs vs lazy baseline $baseline")
  }

  test("x36 LM scoring broadcasts the vocabulary-sized model; the " +
    "corpus shuffles only for the doc rollup") {
    val p = finalPlanOf("x36_lm_quality")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x32 repetition signals are a pure per-row fold: no hash " +
    "exchange anywhere") {
    val p = finalPlanOf("x32_repetition")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Generate"), p) // no explode — the fold is in-array
  }

  test("x89 heavy hitters: the candidate recount joins via broadcast, " +
    "never cartesian, and the whole query is lazy (no jobs at build)") {
    // every spark.read.parquet fires a footer/schema job at build; the
    // laziness claim is "no jobs BEYOND x89's single table read" (the
    // x31-lazy discipline, baseline-normalized like the x31 test)
    def jobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).length
    val j0 = jobs
    graft.Tables.spread(spark, "/root/testdata/sf0.001", "documents")
    val j1 = jobs
    val df = SparkEntry.queries("x89_heavy_hitters")(spark,
      "/root/testdata/sf0.001")
    val j2 = jobs
    assert(j2 - j1 <= j1 - j0,
      s"x89 construction fired ${j2 - j1} jobs vs ${j1 - j0} for a read")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), s"candidate join not broadcast:\n$p")
  }

  test("x88 coverage gates are a pure per-row fold like x32: no hash " +
    "exchange, no explode") {
    val p = finalPlanOf("x88_gopher_coverage")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Generate"), p) // coverage math is all in-array
  }

  test("x33 incremental dedup probes the band index with equi-joins " +
    "only — no cartesian surface") {
    val p = finalPlanOf("x33_incremental_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("x34 PQ encode/score is join-free codegen: dot_matrix passes, " +
    "LUT sums, one rank exchange") {
    val p = finalPlanOf("x34_ann_pq")
    assert(p.contains("dot_matrix"), p) // encode stays in codegen
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("ShuffledHashJoin") && !p.contains("NestedLoop"), p)
    // spread fan-out + the per-query rank window: nothing else shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange:\n$p")
  }

  test("x37 IVF-PQ stays join-free: cell + codes in one codegen " +
    "projection, one rank exchange") {
    val p = finalPlanOf("x37_ann_ivfpq")
    assert(p.contains("dot_matrix"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("ShuffledHashJoin") && !p.contains("NestedLoop"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange:\n$p")
  }

  test("x52 PQ refine: the corpus is scanned, never shuffled — the " +
    "shortlist and query sides broadcast, and only the rank windows " +
    "exchange") {
    val p = finalPlanOf("x52_ann_pq_refine")
    // both refine joins carry the tiny side as a broadcast
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p)
    assert(p.contains("dot_matrix"), p) // ADC encode is codegen
    assert(p.contains("dot_product"), p) // exact re-rank is codegen
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("CartesianProduct"), p)
    // two rank windows (ADC shortlist + exact re-rank), nothing else
    // hash-exchanges; both windows partition on the 8-row qid domain
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges:\n$p")
  }

  test("x65 JL refine: one dot_matrix projection pass, broadcast query " +
    "and shortlist sides, corpus never shuffles") {
    val p = finalPlanOf("x65_ann_jl_refine")
    assert(p.contains("dot_matrix"), p) // the JL projection is codegen
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("CartesianProduct"), p)
    // two rank windows (projected shortlist + exact re-rank)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges:\n$p")
  }

  test("x53 MMR: pool selection broadcasts the query side and spends " +
    "one rank exchange; the corpus never shuffles") {
    import graft.queries.VectorOps
    // the distributed stage of the MMR body is the pool selection;
    // its plan is the x9 shape (broadcast + one window exchange). The
    // registry body then collects the 96-row pool, so assert on the
    // pool frame the body builds rather than the final 40-row local
    // result.
    val e = VectorOps.normalizedEmbeddings(spark, dir)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val pool = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(VectorOps.dot(col("qv"), col("v")) * 10000)
          .cast("long").as("rel4"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rel4").desc,
          col("nid"))))
      .filter(col("rn") <= 12)
    pool.collect() // materialize so AQE finalizes
    val p = pool.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange:\n$p")
  }

  test("x47 BM25 never goes cartesian: posting-list joins are all " +
    "equi-joins and the corpus-stat side broadcasts") {
    val p = finalPlanOf("x47_bm25")
    assert(!p.contains("CartesianProduct"), p)
    // the 1-row corpus stats ride a broadcast, never a shuffle join
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    // inverted-index scoring legitimately exchanges on term/doc_id/qid
    // (tf, df, contributions, rank) — pin the count so a regression
    // that adds an extra shuffle fails loudly
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 7, s"expected <=7 hash exchanges:\n$p")
  }

  test("x49 semantic dedup pairs only within cells: the pair join is " +
    "an equi-join on cell, never cartesian or nested-loop") {
    val p = finalPlanOf("x49_semantic_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x85/x86/x87 graph-dedup family: every join is equi (cell, " +
    "bridge id, or vec id) — never cartesian or nested-loop") {
    for (q <- Seq("x85_semdedup_edges", "x86_knn_graph",
        "x87_nn_descent")) {
      val p = finalPlanOf(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("x54 mixture design is one corpus aggregation plus broadcast " +
    "totals — the corpus shuffles one row per source, nothing more") {
    val p = finalPlanOf("x54_temperature_mixture")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // two groupBy(source) exchanges (the shares branch and the totals
    // branch re-derive from the scan), each carrying one row per source
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges:\n$p")
  }

  test("x57 source overlap: the pair join is key-equi after a " +
    "distinct, never cartesian; x58/x59 are single-aggregation plans") {
    val p57 = finalPlanOf("x57_source_overlap")
    assert(!p57.contains("CartesianProduct") &&
      !p57.contains("BroadcastNestedLoopJoin"), p57)
    val p58 = finalPlanOf("x58_length_buckets")
    assert(!p58.contains("Join"), p58) // pure projection + agg
    val p59 = finalPlanOf("x59_hash_split")
    assert(!p59.contains("CartesianProduct") &&
      !p59.contains("SortMergeJoin"), p59) // totals ride a broadcast
  }

  test("x48 SQ8 broadcasts the query side and only the rank window " +
    "shuffles — encode/dequantize never move the corpus") {
    val p = finalPlanOf("x48_ann_sq8")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(p.contains("dot_product"), p) // the score is codegen
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange:\n$p")
  }

  test("x51 IVF-SQ8 keeps both parents' discipline: cells + codes in " +
    "one corpus projection, query side broadcast, one rank exchange") {
    val p = finalPlanOf("x51_ann_ivf_sq8")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(p.contains("dot_product"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange:\n$p")
  }

  test("x43/x44 trained searches keep the corpus discipline: encode " +
    "in codegen, no shuffling joins, one rank exchange") {
    // training runs as separate bounded jobs before the search plan;
    // the SEARCH itself must look like x37's — dot_matrix encode, no
    // SMJ/shuffled join of the corpus (x44's residual subtraction adds
    // one BROADCAST of the 16 centroids, which ships no corpus rows),
    // and only the per-query rank window shuffles
    for (name <- Seq("x43_ann_ivfpq_trained", "x44_ann_ivfpq_residual")) {
      val p = finalPlanOf(name)
      assert(p.contains("dot_matrix"), s"$name:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
        && !p.contains("NestedLoop"), s"$name:\n$p")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges <= 1, s"$name: expected <=1 hash exchange:\n$p")
    }
  }

  test("x70/x71/x72 plan shapes: prefix join is key-equi (never " +
    "cartesian), prototype/LM tables ride broadcasts, assignment " +
    "stays codegen") {
    // x70: candidate generation joins prefix postings on the shingle
    // hash; verification joins candidate ids back to the doc arrays —
    // every join key-equi, nothing nested-loop/cartesian
    val p70 = finalPlanOf("x70_ppjoin")
    assert(!p70.contains("CartesianProduct") &&
      !p70.contains("BroadcastNestedLoopJoin"), p70)
    // x71: cell assignment is the one-pass codegen DotMatrix; the
    // cells-sized prototype table broadcasts back onto the corpus —
    // no shuffling join anywhere
    val p71 = finalPlanOf("x71_density_prune")
    assert(p71.contains("dot_matrix"), p71)
    assert(p71.contains("BroadcastHashJoin"), p71)
    assert(!p71.contains("SortMergeJoin") &&
      !p71.contains("ShuffledHashJoin") &&
      !p71.contains("CartesianProduct"), p71)
    // x72: the vocabulary-sized LM tables must broadcast (the corpus
    // side shuffles only on doc_id for its window/aggregation pair)
    val p72 = finalPlanOf("x72_mink_prob")
    assert(p72.contains("BroadcastHashJoin"), p72)
    assert(!p72.contains("SortMergeJoin") &&
      !p72.contains("CartesianProduct"), p72)
  }

  test("x73/x74/x75 selection/retrieval plans: model tables ride " +
    "broadcasts, the corpus never sort-merge-joins or goes cartesian") {
    // x73: the B=64 λ table broadcasts; the raw pool's only shuffles
    // are its aggregations
    val p73 = finalPlanOf("x73_dsir_weights")
    assert(p73.contains("BroadcastHashJoin"), p73)
    assert(!p73.contains("SortMergeJoin") &&
      !p73.contains("ShuffledHashJoin") &&
      !p73.contains("CartesianProduct"), p73)
    // x74: class fan-out is a broadcast nested loop over |classes|
    // rows; the class x vocab likelihood table broadcast-hash-joins
    val p74 = finalPlanOf("x74_nb_classifier")
    assert(p74.contains("BroadcastHashJoin"), p74)
    assert(!p74.contains("SortMergeJoin") &&
      !p74.contains("CartesianProduct"), p74)
    // x75: ub/θ/count tables all broadcast back onto the candidate
    // frame; the postings joins are key-equi
    val p75 = finalPlanOf("x75_bm25_wand")
    assert(p75.contains("BroadcastHashJoin"), p75)
    assert(!p75.contains("CartesianProduct"), p75)
  }

  test("x110/x111 retrieval-stage plans: the pairwise scorer sees only " +
    "the shortlist (mapPartitions above a pair-sized frame, corpus " +
    "joins key-equi), the hard-negative exclusion rides a broadcast " +
    "anti-join — no cartesian anywhere") {
    // x110: feature assembly is posting equi-joins; the batched model
    // runs in a MapPartitions above the pair rollup, never the corpus.
    // The only nested loop is the BM25 chain's sanctioned 1-row
    // corpus-totals broadcast cross (same as x47/x75)
    val p110 = finalPlanOf("x110_rerank_cross")
    assert(p110.contains("MapPartitions"), p110)
    assert(!p110.contains("CartesianProduct"), p110)
    p110.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("BuildRight, Cross"), l))
    // x111: the near-dup exclusion set broadcasts into a left-anti;
    // same 1-row totals cross as every BM25 consumer, nothing else
    val p111 = finalPlanOf("x111_hard_negatives")
    assert(p111.contains("BroadcastHashJoin") &&
      p111.contains("LeftAnti"), p111)
    assert(!p111.contains("CartesianProduct"), p111)
    p111.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("BuildRight, Cross"), l))
  }

  test("x112 edit-distance verify: candidate generation is the x6 " +
    "key-equi shingle join and Levenshtein attaches by id-equi joins " +
    "— never a cartesian text-pair surface") {
    val p = finalPlanOf("x112_edit_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the O(len^2) verify expression must sit ABOVE the blocked pair
    // relation, not in any join condition (a levenshtein join predicate
    // would force a nested-loop comparison of every text pair)
    p.linesIterator.filter(_.contains("Join")).foreach(l =>
      assert(!l.contains("levenshtein"), l))
  }

  test("x98/x100 pair generation is key-equi; x99 joins only against " +
    "the literal source-pair relation — no nested loops anywhere") {
    // x98: orientation + wedge + closure joins all equi on node ids
    val p98 = finalPlanOf("x98_triangles")
    assert(!p98.contains("CartesianProduct") &&
      !p98.contains("BroadcastNestedLoopJoin"), p98)
    // x100: probe-prefix postings join and the verification joins are
    // all equi; the corpus never goes cartesian
    val p100 = finalPlanOf("x100_containment")
    assert(!p100.contains("CartesianProduct") &&
      !p100.contains("BroadcastNestedLoopJoin"), p100)
    // x99: everything pairwise runs on <=K-row sketches against the
    // literal source-pair relation — every join equi, no nested loop
    val p99 = finalPlanOf("x99_kmv_overlap")
    assert(!p99.contains("CartesianProduct") &&
      !p99.contains("BroadcastNestedLoopJoin"), p99)
  }

  test("e10's rank window is rewritten to the heap top-k operator " +
    "and no sort survives around its exchange") {
    GraftExtensions.install(spark)
    val p = finalPlanOf("e10_trending")
    assert(p.contains("FinalTopK") && p.contains("PartialTopK"), p)
    assert(!p.contains("WindowGroupLimit"), p)
  }

  test("e8 interval join plans as an equi-join on user_id with the " +
    "time band as a residual — never a nested loop") {
    val p = finalPlanOf("e8_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    // the band rewrite must NOT have fired (equi-key already present)
    assert(!p.contains("band"), p)
  }

  test("x113 phrase search: every stage a keyed equi-join with the " +
    "phrase side broadcast — never a nested loop over the corpus") {
    val p = planOf("x113_phrase_search")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // both the conjunctive prune and the positional stage broadcast
    // the ≤ queries×plen phrase side
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("x118 late interaction: the MaxSim stage is shortlist-bounded " +
    "keyed equi-joins with the query side broadcast — no nested loop " +
    "beyond the BM25 chain's sanctioned 1-row totals cross") {
    val p = finalPlanOf("x118_late_interaction")
    assert(!p.contains("CartesianProduct"), p)
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("BuildRight, Cross"), l))
    // the shortlist-doc prune and the (qid, qterm) pair join both
    // broadcast their bounded side into the corpus-derived relation
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("x114 graph search and x116 walks: frontier-sized broadcasts, " +
    "no corpus-shaped nested loop anywhere in the hop chain") {
    // the per-hop local checkpoints (which keep plans constant-size)
    // hide the hop joins from the final plan string, so the hop frames
    // are pinned through the bodies' inspect hook pre-checkpoint
    val hopPlans = scala.collection.mutable.ArrayBuffer.empty[String]
    def grab(df: org.apache.spark.sql.DataFrame): Unit =
      hopPlans += df.queryExecution.executedPlan.toString
    queries.VectorOps.graphSearch(spark, dir, inspect = grab).collect()
    queries.VectorOps.graphWalks(spark, dir, inspect = grab).collect()
    // x121's biased steps ride the same per-step discipline — the
    // membership LEFT join must stay keyed, never a nested loop
    queries.VectorOps.node2vecWalks(spark, dir, inspect = grab)
      .collect()
    assert(hopPlans.size ==
      queries.VectorOps.GraphHops + 2 * queries.VectorOps.WalkSteps)
    hopPlans.foreach { p =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
    // every search hop broadcasts the beam side into the corpus join
    assert(hopPlans.take(queries.VectorOps.GraphHops)
      .forall(_.contains("BroadcastHashJoin")),
      hopPlans.take(queries.VectorOps.GraphHops).mkString("\n---\n"))
  }

  test("x115 quantile sketch: the value scan partial-aggregates to " +
    "bin counts map-side before the one exchange") {
    val p = finalPlanOf("x115_quantile_sketch")
    assert(!p.contains("CartesianProduct"), p)
    // partial HashAggregate on qbin below the exchange: the values
    // themselves never shuffle, only the fixed bin table
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }
}
