package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DateExprs._

/** Golden values lifted from the reference's own unit tests
  * (test/test_C_segaux.py — library-independent math). */
class ExprsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ordinalOf matches Python date.toordinal (1980-01-01 -> 722815)") {
    val got = Seq("1980-01-01", "0001-01-01", "1970-01-01").toDF("d")
      .select(ordinalOf($"d".cast("date")).as("o")).as[Int].collect()
    assert(got.toSeq == Seq(722815, 1, 719163))
  }

  test("dateFromOrdinal inverts ordinalOf incl. year 1") {
    val got = Seq(722815, 1, 719163).toDF("o")
      .select(dateFromOrdinal($"o").cast("string")).as[String].collect()
    assert(got.toSeq == Seq("1980-01-01", "0001-01-01", "1970-01-01"))
  }

  test("averageReflectance golden: int 2 + slope 0.1 @ 1980-01-01 = 72283.5") {
    // ref: test/test_C_segaux.py:288-333
    val got = Seq(1).toDF("x")
      .select(averageReflectance(lit(2.0), array(lit(0.1)),
        lit("1980-01-01").cast("date")).as("ar")).as[Double].head()
    assert(got == 72283.5)
  }

  test("prediction date explode counts match the reference goldens") {
    // ref: test/test_C_segaux.py:117-209 via FIXTURES.md §6
    val cases = Seq(
      ("1980-01-01", "1986-06-01", 6),  // 07-01 of 1980..1985
      ("1980-01-01", "1986-09-01", 7),  // ... plus 1986
      ("1982-12-07", "2017-08-09", 35), // 1983..2017
      ("0001-01-01", "0002-11-01", 2))  // year-1 span (not the sentinel)
    cases.foreach { case (s, e, n) =>
      val got = Seq((s, e)).toDF("s", "e")
        .select(predictionDates(
          $"s".cast("date"), $"e".cast("date"), 7, 1).as("pday"))
        .count()
      assert(got == n, s"[$s, $e] expected $n rows got $got")
    }
  }

  test("year-1 span that is NOT the sentinel explodes per-year") {
    // 0001-06-01..0002-11-01 spans years 1..2, 07-01 inside both
    val got = Seq(1).toDF("x")
      .select(predictionDates(lit("0001-06-01").cast("date"),
        lit("0002-11-01").cast("date"), 7, 1).as("pday"))
      .select($"pday".cast("string"))
      .as[String].collect()
    assert(got.toSeq == Seq("0001-07-01", "0002-07-01"))
  }

  test("default segment explodes to exactly the sentinel pday") {
    val got = Seq(1).toDF("x")
      .select(predictionDates(lit("0001-01-01").cast("date"),
        lit("0001-01-01").cast("date"), 7, 1).as("pday"))
      .select($"pday".cast("string"))
      .as[String].collect()
    assert(got.toSeq == Seq("0001-01-01"))
  }

  test("bigrams window is guarded: empty for short docs, adjacent " +
    "pairs otherwise") {
    val got = Seq("a b c d", "a", "", "x y").toDF("t")
      .select(graft.functions.TextExprs.bigrams(
        graft.functions.TextExprs.wsTokens($"t")).as("b"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1).isEmpty) // 1 token: sequence(1,0) must never fire
    assert(got(2).isEmpty) // empty text
    assert(got(3) == Seq("x y"))
  }
}
