package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BandedRangeJoin optimizer rule: a naive inner point-in-interval
  * join must plan as an equi-join (no nested-loop) and return exactly
  * the rows the unrewritten join returns.
  */
class BandedRangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  GraftExtensions.install(spark)

  test("band keys within w of Long.MinValue do not overflow (matching " +
    "rows survive the rewrite)") {
    // the old (e - pmod(e, w)) / w floor division wrapped for values
    // within w of Long.MinValue, assigning a wildly wrong band and
    // silently LOSING the match in non-ANSI mode
    val p = Seq(Tuple1(Long.MinValue + 4L)).toDF("t")
    val c = Seq(Tuple1(Long.MinValue + 1L), Tuple1(Long.MinValue + 6L))
      .toDF("u")
    val j = p.join(c, c("u") >= p("t") - 3L && c("u") < p("t"))
      .select(p("t"), c("u"))
    val got = j.as[(Long, Long)].collect().toSet
    assert(got == Set((Long.MinValue + 4L, Long.MinValue + 1L)), got)
  }

  private val W = 100L

  // left: probes (k, t); right: candidates (k, u); match iff same k and
  // u in [t - W, t). Data straddles band boundaries and includes
  // negative times (floor-div sign case) and a key with no matches.
  private val probes: DataFrame = Seq(
    (1L, 250L), (1L, 1000L), (2L, 50L), (3L, -120L), (9L, 500L))
    .toDF("k", "t")
  private val cands: DataFrame = Seq(
    (1L, 151L), (1L, 249L), (1L, 250L), (1L, 899L), (1L, 999L),
    (2L, -40L), (2L, 49L), (3L, -220L), (3L, -121L), (3L, -120L),
    (7L, 500L)).toDF("k", "u")

  private def joined: DataFrame =
    probes.join(cands,
      probes("k") === cands("k") &&
        cands("u") >= probes("t") - W && cands("u") < probes("t"))
      .select(probes("k"), probes("t"), cands("u"))

  private def bruteForce: Set[(Long, Long, Long)] = {
    val p = probes.as[(Long, Long)].collect()
    val c = cands.as[(Long, Long)].collect()
    (for {
      (k, t) <- p; (k2, u) <- c
      if k == k2 && u >= t - W && u < t
    } yield (k, t, u)).toSet
  }

  test("joins that already have an equality key are NOT banded") {
    // k-equality makes this a plain hash/sort-merge join with range
    // residuals — never at BNLJ risk, so the rule must not pay the 2x
    // Generate (VERDICT r4: j6 doubled its click side for nothing)
    val df = joined
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("__graft_band"), plan)
  }

  test("equality-key range join returns exactly the brute-force row set") {
    val got = joined.as[(Long, Long, Long)].collect().toSet
    assert(got == bruteForce)
    assert(got.nonEmpty) // the fixture actually exercises matches
    // boundary semantics: u = t excluded, u = t - W included
    assert(got.contains((1L, 250L, 151L)) && !got.contains((1L, 250L, 250L)))
    // negative-time bands (floor division, not truncate-toward-zero)
    assert(got.contains((3L, -120L, -220L)) && got.contains((3L, -120L, -121L)))
  }

  test("pure range join (no key equality) also bands — no cartesian") {
    val df = probes.join(cands,
      cands("u") >= probes("t") - W && cands("u") < probes("t"))
      .select(probes("t"), cands("u"))
    val got = df.as[(Long, Long)].collect().toSet
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val p = probes.as[(Long, Long)].collect()
    val c = cands.as[(Long, Long)].collect()
    val expected = (for {
      (_, t) <- p; (_, u) <- c if u >= t - W && u < t
    } yield (t, u)).toSet
    assert(got == expected)
  }

  test("raw timestamp operands band through the implicit unix_micros " +
    "wrap") {
    // pure time-range fixture (no key equality, the shape that would
    // otherwise nest-loop); the condition is written on RAW timestamps
    // with an interval literal — no manual unix_micros
    val pTs = probes.select($"k",
      timestamp_micros($"t" * 1000000L).as("ts"))
    val cTs = cands.select($"k".as("ck"),
      timestamp_micros($"u" * 1000000L).as("cts"))
    val df = pTs.join(cTs,
      cTs("cts") >= pTs("ts") - expr(s"INTERVAL $W SECONDS") &&
        cTs("cts") < pTs("ts"))
      .select(unix_micros($"ts").as("t"), unix_micros($"cts").as("u"))
    val got = df.as[(Long, Long)].collect().toSet
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__graft_band"), plan)
    val p = probes.as[(Long, Long)].collect()
    val c = cands.as[(Long, Long)].collect()
    val expected = (for {
      (_, t) <- p; (_, u) <- c if u >= t - W && u < t
    } yield (t * 1000000L, u * 1000000L)).toSet
    assert(got == expected)
  }

  test("non-matching shapes are left alone (outer join keeps BNLJ)") {
    val df = probes.join(cands,
      probes("k") === cands("k") &&
        cands("u") >= probes("t") - W && cands("u") < probes("t"), "left")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_band"), plan)
  }
}
