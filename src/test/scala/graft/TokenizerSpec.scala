package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TokenOps

/** BPE trainer/encoder (x62/x63) semantics pins. The engine-identity of
  * the learned merges is the DuckDB oracle's job; these pin the parts an
  * oracle can't see: the merge-application string semantics (classical
  * left-to-right non-overlapping BPE on tricky inputs), the trained
  * artifacts' internal consistency, and the encode plan shape.
  */
class TokenizerSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The canonical-form merge `replace(s, ~l~~r~, ~lr~)` on words chosen
    * to hit the classical BPE edge cases. */
  test("merge application is left-to-right, non-overlapping, boundary-anchored") {
    val df = spark.createDataFrame(Seq(
      Tuple1("aaaa"), // back-to-back: (a,a) -> [aa, aa, #]
      Tuple1("aaa"), // odd run: (a,a) -> [aa, a, #]
      Tuple1("abab"), // adjacent occurrences: (a,b) -> [ab, ab, #]
      Tuple1("ab"))) // plain
      .toDF("w")
      .withColumn("s", concat(lit("~~"),
        regexp_replace(concat(col("w"), lit("#")), "(.)", "$1~~")))
      .withColumn("m1", replace(col("s"), lit("~a~~a~"), lit("~aa~")))
      .withColumn("m2", replace(col("s"), lit("~a~~b~"), lit("~ab~")))
    val byW = df.orderBy("w").collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getString(3))).toMap
    assert(byW("aaaa")._1 == "~~aa~~aa~~#~~")
    assert(byW("aaa")._1 == "~~aa~~a~~#~~")
    assert(byW("abab")._2 == "~~ab~~ab~~#~~")
    assert(byW("ab")._2 == "~~ab~~#~~")
    // boundary anchoring: after (a,b)->ab, a stale (b,#) merge must NOT
    // fire inside the fused symbol
    val fused = spark.createDataFrame(Seq(Tuple1("~~ab~~#~~"))).toDF("s")
      .withColumn("m", replace(col("s"), lit("~b~~#~"), lit("~b#~")))
      .collect()(0).getString(1)
    assert(fused == "~~ab~~#~~")
  }

  test("x62 merges are internally consistent and ordered") {
    val (merges, vocab) = TokenOps.trainBpe(spark, dir)
    assert(merges.map(_.step) == (1L to TokenOps.Merges.toLong))
    assert(merges.forall(_.cnt > 0))
    // each learned pair's symbols exist at its round: left/right are
    // either single chars, '#', or concatenations of earlier merges
    val grown = merges.scanLeft(Set.empty[String]) { (acc, m) =>
      acc + (m.l + m.r)
    }
    merges.zip(grown).foreach { case (m, earlier) =>
      def ok(sym: String) =
        sym.length == 1 || sym == "#" || earlier.contains(sym)
      assert(ok(m.l) && ok(m.r), s"${m.l} + ${m.r} at step ${m.step}")
    }
    // the vocab's final spelling round-trips: symbols concatenate back
    // to word + '#'
    val bad = vocab
      .select(col("w"), array_join(filter(split(col("s"), "~~"),
        x => length(x) > 0), "").as("joined"))
      .filter(col("joined") =!= concat(col("w"), lit("#")))
      .count()
    assert(bad == 0L)
  }

  test("x63 encode: merges strictly compress vs character spelling") {
    val enc = SparkEntry.queries("x63_bpe_encode")(spark, dir)
      .agg(sum("n_tokens"), sum("n_words")).collect()(0)
    val (nTok, nWords) = (enc.getLong(0), enc.getLong(1))
    // char spelling would cost sum(len(w)) + 1 marker per word; the
    // trained merges must beat it on the corpus they were trained on
    val chars = TokenOps.wordFreq(spark, dir)
      .agg(sum(length(col("w")) * col("f") + col("f"))).collect()(0)
      .getLong(0)
    assert(nTok < chars, s"$nTok !< $chars")
    assert(nTok >= nWords) // at least one token per word
  }

  test("x67 PMI lift: integer ranking, positive association on top") {
    val rows = SparkEntry.queries("x67_pmi_cooccur")(spark, dir)
      .select("w1", "w2", "n_pair", "lift_ppm", "rn").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 20)
    assert(rows.forall(_._3 >= 5))
    // rn follows lift_ppm descending (integer ranking, no float ties)
    val byRn = rows.sortBy(_._5).map(_._4)
    assert(byRn.sameElements(byRn.sorted.reverse), byRn.toSeq.toString)
    // the top association is far above independence (lift 1e6 = the
    // two words co-occur exactly as often as chance predicts)
    assert(rows.minBy(_._5)._4 > 1000000L)
    // unordered normal form: w1 < w2 everywhere
    assert(rows.forall(t => t._1 < t._2))
  }

  test("x63 plan: corpus side joins the vocab via broadcast, one rollup agg") {
    val df = SparkEntry.queries("x63_bpe_encode")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
