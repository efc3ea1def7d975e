package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch (x64) guarantee pins: the estimator never
  * undercounts, the counter matrix stays at its fixed geometry, and the
  * probe side joins the broadcast matrix (no corpus shuffle for
  * estimation).
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out = {
    val df = SparkEntry.queries("x64_cms_counts")(spark, dir)
    df.collect()
    df
  }

  test("x64 CMS never undercounts; min over rows recovers most terms") {
    val rows = out.select("term", "est", "true_cnt", "overcount").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"undercount at ${r.getString(0)}")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
    // W=128 over the ~31-term vocab: collisions exist in single rows but
    // the 4-row min recovers the exact count for most terms
    val exact = rows.count(_.getLong(3) == 0L)
    assert(exact * 2 >= rows.length, s"only $exact/${rows.length} exact")
  }

  test("x64 sketch state is the fixed D x W matrix, probe is broadcast") {
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    // the sum of all cells in one hash row equals the token count —
    // the counter matrix is a complete partition of the stream
    val toks = queries.TokenOps.wordFreq(spark, dir)
      .agg(sum("f")).collect()(0).getLong(0)
    val estSum = out.agg(sum("true_cnt")).collect()(0).getLong(0)
    assert(estSum == toks)
  }

  test("x90 HLL: register table bounded at m, estimate lands within " +
    "the sketch's error regime, and rises with true cardinality") {
    import graft.queries.SketchOps
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir, "documents")
    val regs = SketchOps.hllRegisters(SketchOps.tokensOf(docs)).collect()
    assert(regs.length <= 256, s"${regs.length} registers")
    regs.foreach(r => assert(r.getInt(1) >= 1 && r.getInt(1) <= 41))
    val row = SparkEntry.queries("x90_hll_distinct")(spark, dir).head()
    val (n, est) = (row.getLong(0), row.getDouble(3))
    assert(n > 0)
    // linear-counting regime at this cardinality: comfortably tight
    assert(math.abs(est - n) / n <= 0.15, s"est $est vs exact $n")
    // a synthetic high-cardinality stream estimates high-cardinality
    import spark.implicits._
    val wide = (0 until 5000).map(i => s"key$i").toDF("w")
    val wideEst = SketchOps.hllEstimate(SketchOps.hllRegisters(wide))
      .head().getDouble(2)
    assert(wideEst > 3500 && wideEst < 6500, s"wide est $wideEst")
  }

  test("x99 KMV overlap: estimator branch lands in regime on a " +
    "high-cardinality pair; sub-K sketches are exact") {
    import spark.implicits._
    import graft.functions.{TextExprs => T}
    import graft.queries.SketchOps
    // two synthetic sources, 5000 distinct keys each, true overlap
    // 2500 (Jaccard 1/3) — deep enough that kc = K and the (K−1)·M/hk
    // estimator actually runs (the 25-doc-per-source testdata never
    // leaves the exact branch)
    val a = (0 until 5000).map(i => ("a", s"key$i"))
    val b = (2500 until 7500).map(i => ("b", s"key$i"))
    val keyed = (a ++ b).toDF("source", "w")
      .select($"source", T.md5Long($"w").as("hv"))
    val r = SketchOps.kmvOverlapMatrix(keyed).head()
    val (kc, mBoth) = (r.getLong(2), r.getLong(4))
    val (uEst, iEst, jac) = (r.getLong(5), r.getLong(6), r.getLong(7))
    val (uEx, iEx) = (r.getLong(8), r.getLong(9))
    assert(kc == SketchOps.KmvK, s"sketch not full: $kc")
    assert(uEx == 7500 && iEx == 2500)
    // k = 128 → relative sd ≈ 8.9 %; assert a 4σ band
    assert(math.abs(uEst - 7500) < 7500 * 0.36, s"union est $uEst")
    assert(math.abs(jac - 333333) < 170000, s"jaccard ppm $jac")
    assert(iEst <= uEst && mBoth <= kc)
    // sub-K regime: sketches ARE the sets — every estimate exact
    val small = ((0 until 40).map(i => ("a", s"k$i")) ++
      (20 until 60).map(i => ("b", s"k$i"))).toDF("source", "w")
      .select($"source", T.md5Long($"w").as("hv"))
    val sr = SketchOps.kmvOverlapMatrix(small).head()
    assert(sr.getLong(5) == 60 && sr.getLong(8) == 60) // union
    assert(sr.getLong(4) == 20 && sr.getLong(9) == 20) // intersection
    assert(sr.getLong(6) == 20, s"inter_est ${sr.getLong(6)}")
  }

  test("x115 quantile bin is exact at dyadic boundaries and fails " +
    "loudly past the supported bit range") {
    import graft.queries.SketchOps
    import spark.implicits._
    // bit-length boundaries the floating-log formulation would split:
    // 8 must bin as e=3 (ln 8 / ln 2 = 2.999...), and the top of the
    // supported range must still bin exactly
    val vals = Seq(1L, 7L, 8L, 9L, 255L, 256L,
      (1L << 47) + 12345L, (1L << 48) - 1L)
    val got = vals.toDF("n")
      .select($"n", SketchOps.quantileBin($"n").as("qbin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expect(n: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
      8L * e + (n * 8 >> e) - 8
    }
    vals.foreach(n => assert(got(n) == expect(n),
      s"n=$n got ${got(n)} want ${expect(n)}"))
    // a value past the 48-bit range must abort the job (the n*8
    // shift-divide would wrap at 2^60 and mis-bin silently)
    val e = intercept[Exception] {
      Seq(1L << 48).toDF("n")
        .select(SketchOps.quantileBin($"n")).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("48 bits") ||
        Option(e.getCause).exists(_.getMessage.contains("48 bits"))),
      e.toString)
  }
}
