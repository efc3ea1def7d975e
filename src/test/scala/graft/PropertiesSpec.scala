package graft

import java.time.LocalDate
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DateExprs

/** Property-based invariants (SURVEY §5 test plan d): explode row
  * counts, sampling caps, ordinal round-trips — checked over
  * ScalaCheck-generated inputs (sampled with fixed seeds and batched
  * into single Spark jobs per property).
  */
class PropertiesSpec extends AnyFunSuite with SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))
  import spark.implicits._

  private val dateGen: Gen[LocalDate] = for {
    y <- Gen.chooseNum(1, 2400)
    d <- Gen.chooseNum(1, 365)
  } yield LocalDate.ofYearDay(y, d)

  test("ordinal round-trips for any proleptic date incl. year 1") {
    val dates = sample(Gen.listOfN(60, dateGen), 1L).map(_.toString)
    val got = dates.toDF("d")
      .select($"d", DateExprs.dateFromOrdinal(
        DateExprs.ordinalOf($"d".cast("date"))).cast("string").as("rt"))
      .as[(String, String)].collect()
    got.foreach { case (d, rt) => assert(d == rt) }
  }

  test("annual explode emits exactly the month/day dates inside the span") {
    val pairs = sample(Gen.listOfN(40,
      for { a <- dateGen; b <- dateGen } yield
        if (a.isAfter(b)) (b, a) else (a, b)), 2L).distinct
    val df = pairs.map { case (a, b) => (a.toString, b.toString) }
      .toDF("s", "e")
      .select($"s".cast("date").as("s"), $"e".cast("date").as("e"))
      .select($"s", $"e", DateExprs.predictionDates($"s", $"e", 7, 1)
        .as("pday"))
    val got = df.groupBy($"s", $"e").agg(count(lit(1)).as("n"))
      .as[(java.sql.Date, java.sql.Date, Long)].collect()
      .map { case (s, e, n) => (s.toString, e.toString) -> n }.toMap
    val sentinel = LocalDate.of(1, 1, 1)
    pairs.foreach { case (a, b) =>
      // the sentinel span IS the default segment: exactly one row
      val expected =
        if (a == sentinel && b == sentinel) 1
        else (a.getYear to b.getYear).count { y =>
          val p = LocalDate.of(y, 7, 1)
          !p.isBefore(a) && !p.isAfter(b)
        }
      val key = (a.toString, b.toString)
      if (expected > 0) assert(got(key) == expected, s"$key")
      else assert(!got.contains(key) || got(key) == 0, s"$key")
    }
  }

  test("stratified sample honors caps for arbitrary class histograms") {
    val histGen = Gen.nonEmptyMap(Gen.zip(Gen.chooseNum(0, 8),
      Gen.chooseNum(1, 40)))
    (1 to 5).foreach { trial =>
      val hist = sample(histGen, trial.toLong)
      val rows = hist.toSeq.flatMap { case (lab, n) => Seq.fill(n)(lab) }
      val df = rows.toDF("label")
      val target = 30L; val cmin = 2L; val cmax = 10L
      val got = ops.Features.stratifiedSample(df, target, cmin, cmax)
        .groupBy($"label").count()
        .as[(Int, Long)].collect().toMap
      val total = rows.size.toDouble
      hist.foreach { case (lab, n) =>
        val pct = n / total
        val cap = math.min(math.max(math.ceil(target * pct).toLong, cmin), cmax)
        val expect = math.min(cap, n.toLong)
        assert(got.getOrElse(lab, 0L) == expect,
          s"label $lab n=$n cap=$cap got=${got.get(lab)}")
      }
    }
  }

  test("MinHashSig equals the per-component array_min/transform form") {
    val arrGen = Gen.listOfN(30,
      Gen.nonEmptyListOf(Gen.chooseNum(0L, graft.functions.TextExprs.MinhashP - 1)))
    val arrays = sample(arrGen, 7L)
    val sig = 16
    val df = arrays.toDF("hs")
    val fused = df.select(graft.functions.MinHashSig($"hs", sig).as("s"))
      .as[Seq[Long]].collect()
    val hof = df.select(array((0 until sig).map(i =>
        graft.functions.TextExprs.minhash($"hs", i)): _*).as("s"))
      .as[Seq[Long]].collect()
    fused.zip(hof).foreach { case (a, b) => assert(a == b) }
  }

  test("SimHashBits equals the per-bit aggregate-vote form") {
    val arrGen = Gen.listOfN(30,
      Gen.listOf(Gen.chooseNum(0L, (1L << 48) - 1)))
    val arrays = sample(arrGen, 8L)
    val bits = 16
    val df = arrays.toDF("hs")
    val fused = df.select(
      graft.functions.SimHashBits($"hs", bits).as("s")).as[Long].collect()
    // reference semantics: per-bit fold of (+1/-1) votes, bit set iff
    // the vote sum is positive; empty input -> 0
    val expect = arrays.map { hs =>
      (0 until bits).map { b =>
        val v = hs.map(h => ((h >> b) & 1L) * 2 - 1).sum
        if (v > 0) 1L << b else 0L
      }.sum
    }
    fused.zip(expect).foreach { case (a, b) => assert(a == b) }
  }

  test("join preserves composite keys (combine is key-exact)") {
    val segs = (1 to 30).map(i => (i % 5L, i % 3L, i.toLong, i * 2L, i))
      .toDF("cx", "cy", "px", "py", "v")
    val aux = (1 to 30).filter(_ % 2 == 0)
      .map(i => (i % 5L, i % 3L, i.toLong, i * 2L, i * 10))
      .toDF("cx", "cy", "px", "py", "a")
    val joined = ops.Features.combine(segs, aux).collect()
    assert(joined.length == 15)
    joined.foreach(r => assert(r.getAs[Int]("a") == r.getAs[Int]("v") * 10))
  }

  test("TopK.perKey equals the window pattern for random data, random " +
    "k, and random (tiny) key/row caps — all four fallback paths") {
    import graft.plans.{FinalTopKExec, PartialTopKExec}
    val savedFK = FinalTopKExec.maxFinalKeys
    val savedFR = FinalTopKExec.maxFinalRows
    val savedPR = PartialTopKExec.maxPartialRows
    try {
      val caseGen = for {
        nRows <- Gen.chooseNum(1, 400)
        nKeys <- Gen.chooseNum(1, 24)
        k <- Gen.chooseNum(1, 40)
        fKeys <- Gen.chooseNum(1, 30)
        fRows <- Gen.chooseNum(1L, 200L)
        pRows <- Gen.chooseNum(1L, 200L)
        vals <- Gen.listOfN(nRows, Gen.chooseNum(-1000L, 1000L))
      } yield (nKeys, k, fKeys, fRows, pRows, vals)
      (1 to 10).foreach { i =>
        val (nKeys, k, fKeys, fRows, pRows, vals) =
          sample(caseGen, 100L + i)
        FinalTopKExec.maxFinalKeys = fKeys
        FinalTopKExec.maxFinalRows = fRows
        PartialTopKExec.maxPartialRows = pRows
        val df = vals.zipWithIndex
          .map { case (v, id) => (id.toLong % nKeys, id.toLong, v) }
          .toDF("key", "id", "v")
          .repartition(3)
        val got = ops.TopK
          .perKey(df, Seq("key"), Seq($"v".desc, $"id".asc), k)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        // the oracle must NOT itself replan through TopKPerKey (any
        // suite that ran GraftExtensions.install on the shared
        // session leaves RankToTopK active, which would make this a
        // self-comparison under the same mutated caps): pin the
        // rewrite off for the reference computation
        spark.conf.set(graft.plans.RankToTopK.RewriteConf, "false")
        val want = try df.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"key").orderBy($"v".desc, $"id".asc)))
          .filter($"rn" <= k)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getInt(3).toLong)).toSet
        finally spark.conf.unset(graft.plans.RankToTopK.RewriteConf)
        assert(got == want,
          s"case $i: keys=$nKeys k=$k caps=($fKeys,$fRows,$pRows) " +
            s"rows=${vals.length}")
      }
    } finally {
      FinalTopKExec.maxFinalKeys = savedFK
      FinalTopKExec.maxFinalRows = savedFR
      PartialTopKExec.maxPartialRows = savedPR
    }
  }

  test("m3 trend refuses LOUDLY where its exact-long products would " +
    "wrap (DuckDB's ANSI multiply throws on the same corpus)") {
    import graft.queries.MlOps
    // sane volumes pass through the guard untouched
    val ok = spark.createDataFrame(
        (1 to 50).map(i => (1L, i.toLong, i.toLong * 1000)))
      .toDF("o_custkey", "x", "y")
    assert(MlOps.trendOver(ok).collect().length == 1)
    // y large enough that n·sxy passes 2^63 while every SUM is still
    // exact: per-row x·y ≈ 5e17, 10 rows → sxy ≈ 5e18 (fits), and
    // n·sxy ≈ 5e19 wraps — the silent-mis-slope case the guard traps
    val bad = spark.createDataFrame(
        (1 to 10).map(i => (1L, i.toLong, 50_000_000_000_000_000L)))
      .toDF("o_custkey", "x", "y")
    val e = intercept[Exception] {
      MlOps.trendOver(bad).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("64-bit overflow")),
      msgs(e).mkString(" | "))
  }

  test("x129 fixed-width interval merge equals a brute-force position " +
    "union for random corpora (adjacent/overlapping/gap edges)") {
    // tiny vocabulary forces heavy window repeats: every merge edge —
    // overlap (gap < w), exactly-adjacent (gap == w), and new-span
    // (gap > w) — occurs in the sampled corpora
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.listOfN(12, Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab))))
    val w = 3
    (1 to 3).foreach { trial =>
      val docs = sample(docGen, 100L + trial)
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = queries.TextOps.substrDedupOf(df, w)
        .select($"doc_id", $"n_tokens", $"dup_tokens", $"dup_spans")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val wins = docs.zipWithIndex.flatMap { case (toks, d) =>
        toks.sliding(w).filter(_.size == w).zipWithIndex
          .map { case (win, i) => (win.mkString(" "), d.toLong, i) }
      }
      val cnt = wins.groupBy(_._1).view.mapValues(_.size).toMap
      docs.zipWithIndex.foreach { case (toks, d) =>
        val covered = wins
          .filter(x => x._2 == d.toLong && cnt(x._1) >= 2)
          .flatMap(x => x._3 until (x._3 + w)).toSet
        if (covered.nonEmpty) {
          val spans = covered.toSeq.sorted
            .foldLeft((0, -2)) { case ((n, prev), p) =>
              (if (p == prev + 1) n else n + 1, p)
            }._1
          val (nt, dt, ds) = got(d.toLong)
          assert(nt == toks.size.toLong, s"trial $trial doc $d n_tokens")
          assert(dt == covered.size.toLong, s"trial $trial doc $d dup_tokens")
          assert(ds == spans.toLong, s"trial $trial doc $d dup_spans")
        } else assert(!got.contains(d.toLong), s"trial $trial doc $d")
      }
    }
  }
}
