package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.StringToColumn
import graft.functions.{TextExprs => T, TextSql => TS}

/** Sketch-based frequency estimation: a count-min sketch over the corpus
  * token stream (x64) — the fixed-memory frequency estimator a 100 TB
  * pipeline uses where an exact per-term count is too wide to hold
  * (heavy-hitter detection, frequency-capped filtering, join-size hints).
  *
  * The sketch build IS a declarative aggregation: hashing each token into
  * its D=4 row buckets and `groupBy(j, bucket).count` is exactly the CMS
  * update rule, and Spark's partial aggregation is exactly the CMS merge
  * (counter matrices add cell-wise) — so the build shuffles only the
  * FIXED D×W counter matrix per map partition (256 cells here), never
  * the token stream. Estimation is `min_j counter[j][h_j(t)]`: the D×W
  * matrix broadcasts and each candidate probes it map-side. The classic
  * CMS guarantee (est ≥ true; overshoot ≤ εN with prob 1-δ, ε = e/W,
  * δ = e^-D) is pinned in `SketchSpec` and visible in the output's
  * `overcount` column (the testdata corpus is small enough to afford the
  * exact-count comparison column; at scale that column is the sketch's
  * raison d'être and would be dropped).
  *
  * Hash family: h_j(t) = md5Long(j ‖ ':' ‖ t) mod W — the same 48-bit
  * md5-prefix integer every other operator uses, so the oracle replays
  * the bucket assignment bit-for-bit.
  */
object SketchOps {

  /** CMS geometry: D hash rows × W buckets. W=128 on the ~31-term
    * testdata vocab leaves a couple of visible collisions (overcount>0)
    * while keeping the ranking informative; a production corpus sizes
    * W ≈ e/ε for the tolerated εN overshoot. */
  private[graft] val D = 4
  private[graft] val W = 128

  // NB the hash-row column is `d`, NOT `j`: TextSql.md5Long's internal
  // list_transform lambda binds a variable named `j`, and DuckDB resolves
  // an outer column of the same name into the lambda body (capture), which
  // silently corrupts every bucket.
  private def bucketSql(d: String, term: String): String =
    s"${TS.md5Long(s"CAST($d AS VARCHAR) || ':' || $term")} % $W"

  /** The corpus token stream of a documents frame. */
  private[graft] def tokensOf(docs: org.apache.spark.sql.DataFrame) =
    docs.select(explode(regexp_extract_all(lower($"text"),
      lit("[a-z]+"), lit(0))).as("w"))

  /** The CMS counter build over a token frame — ONE definition shared by
    * the batch query (x64) and the streaming twin
    * ([[graft.streaming.SketchStream]]), so the two matrices cannot
    * drift. Works unchanged on a streaming frame: the groupBy state IS
    * the D×W matrix (bounded regardless of stream length). */
  private[graft] def cmsCounters(toks: org.apache.spark.sql.DataFrame) = {
    val bucket = T.md5Long(concat($"d".cast("string"), lit(":"), $"w")).%(W)
    toks
      .select($"w", explode(sequence(lit(0), lit(D - 1))).as("d"))
      .select($"d", bucket.as("b"))
      .groupBy($"d", $"b").agg(count(lit(1)).as("c"))
  }

  /** HLL geometry: m = 2^8 registers; the md5Long hash splits into an
    * 8-bit bucket and a 40-bit pattern whose leading-zero count feeds
    * the register. α_m for m = 256, computed driver-side ONCE and
    * interpolated into both engines as the same double literal. */
  private[graft] val HllM = 256
  private val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / HllM) *
    HllM.toDouble * HllM.toDouble

  /** rho = position of the highest set bit from the 40-bit pattern's
    * MSB, i.e. 41 - bitlength(rest) (rest = 0 -> 41). An integer CASE
    * ladder in BOTH engines — no float log2, whose boundary rounding
    * could disagree at exact powers of two. */
  private def rhoCol(rest: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (1 to 40).foldRight(lit(41): org.apache.spark.sql.Column) {
      case (r, acc) => when(rest >= lit(1L << (40 - r)), lit(r))
        .otherwise(acc)
    }
  private def rhoSql(rest: String): String =
    (1 to 40).map(r => s"WHEN $rest >= ${1L << (40 - r)} THEN $r")
      .mkString("CASE ", " ", " ELSE 41 END")

  /** The HLL register table of a token frame, per group: ≤ m rows per
    * group key, built as ONE declarative max-aggregation (partial agg
    * = HLL merge — register maxes combine cell-wise map-side, the
    * token stream never shuffles). Shared by the batch queries
    * (x90/x96), the incremental Store lifecycle, and the streaming
    * twin. */
  private[graft] def hllRegistersBy(toks: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    val kc = keys.map(col)
    toks.select(kc :+ T.md5Long($"w").as("h"): _*)
      .select(kc :+ ($"h" % HllM).as("bucket") :+
        expr(s"h div $HllM").as("rest"): _*)
      .select(kc :+ $"bucket" :+ rhoCol($"rest").as("rho"): _*)
      .groupBy((keys :+ "bucket").map(col): _*).agg(max($"rho").as("r"))
  }

  /** Global (ungrouped) register table — x90's shape. */
  private[graft] def hllRegisters(toks: org.apache.spark.sql.DataFrame) =
    hllRegistersBy(toks, Seq.empty)

  /** Flajolet et al. estimate from a register table, per group:
    * harmonic-mean raw estimate (the 2^-r sum is a sum of dyadic
    * rationals — EXACT in double, engine-identical) with the
    * linear-counting small-range correction. One row per group:
    * (keys..., occupied, zeros, hll_est). */
  private[graft] def hllEstimateBy(
      registers: org.apache.spark.sql.DataFrame, keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val kc = keys.map(col)
    val g = if (keys.isEmpty) registers.groupBy()
      else registers.groupBy(kc: _*)
    g.agg(count(lit(1)).as("occupied"),
        sum(pow(lit(2.0), -$"r")).as("socc"))
      .select(kc ++ Seq($"occupied",
        (lit(HllM.toLong) - $"occupied").as("zeros"),
        (lit(HllAlphaM2) / ($"socc" + (lit(HllM.toLong) - $"occupied")
          .cast("double"))).as("raw")): _*)
      .select(kc ++ Seq($"occupied", $"zeros",
        round(when($"raw" <= lit(2.5 * HllM) && $"zeros" > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) /
            $"zeros".cast("double")))
          .otherwise($"raw"), 4).as("hll_est")): _*)
  }

  /** Global estimate row — x90's shape. */
  private[graft] def hllEstimate(registers: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    hllEstimateBy(registers, Seq.empty)

  /** Incremental cardinality tracking — the x33/x35 pattern applied to
    * the HLL sketch: each ingest batch lands its own ≤ m register
    * rows under a `batch` partition (delete-before-write, replay
    * idempotent); the live estimate max-merges registers across
    * batches — associative and ORDER-FREE, so N batches merged equal
    * the one-shot build bit for bit (StoreSpec pins it). History
    * tokens are never rescanned: a day's append costs one pass over
    * that day's rows and writes ≤ m rows. */
  def appendHllRegisters(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame, batchId: Long,
      store: graft.store.Store): Unit = {
    val regs = hllRegisters(tokensOf(docs))
    store.delete("hll_registers", Seq("batch" -> batchId))
    store.write("hll_registers",
      regs.select(lit(batchId).as("batch"), $"bucket", $"r"),
      Seq("batch"))
  }

  /** Merged registers of every ingested batch → the live estimate. */
  def hllDistinctStored(s: org.apache.spark.sql.SparkSession,
      store: graft.store.Store): org.apache.spark.sql.DataFrame =
    hllEstimate(store.read("hll_registers", s)
      .groupBy($"bucket").agg(max($"r").as("r")))

  val qs: Map[String, Q] = Map(
    // ----- x90 HyperLogLog distinct count, oracle-replayable: the
    // md5 hash splits bucket/pattern, rho is an integer CASE ladder,
    // the register table is one ≤m-row max-aggregation, and the
    // harmonic-mean + linear-counting estimate uses only
    // engine-exact float ops (dyadic sums, one ln, round 4). The
    // oracle replays registers AND estimate; the exact count rides
    // along as the accuracy report.
    "x90_hll_distinct" -> Q(
      s"""WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
         |    '[a-z]+')) AS w FROM documents),
         |h AS (SELECT ${TS.md5Long("w")} AS h FROM t),
         |b AS (SELECT h % $HllM AS bucket, h // $HllM AS rest FROM h),
         |r AS (SELECT bucket, max(${rhoSql("rest")}) AS r
         |  FROM b GROUP BY 1),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS occupied,
         |    sum(power(2.0, -r)) AS socc FROM r),
         |e AS (SELECT occupied, $HllM - occupied AS zeros,
         |    $HllAlphaM2 / (socc + ($HllM - occupied)) AS raw FROM a),
         |x AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_exact
         |  FROM t)
         |SELECT n_exact, occupied, CAST(zeros AS BIGINT) AS zeros,
         |  round(CASE WHEN raw <= ${2.5 * HllM} AND zeros > 0
         |    THEN $HllM * ln($HllM.0 / zeros) ELSE raw END, 4)
         |    AS hll_est
         |FROM x CROSS JOIN e""".stripMargin) { (s, dir) =>
      val toks = tokensOf(Tables.spread(s, dir, "documents"))
      val est = hllEstimate(hllRegisters(toks))
      toks.agg(count_distinct($"w").as("n_exact"))
        .crossJoin(est)
    },

    // ----- x96 grouped HLL: distinct users per event type — the
    // "distinct entities per segment" production query, one ≤m-row
    // register set PER GROUP (a thousand groups cost a thousand
    // 256-row sketches, not a thousand distinct-shuffles of the
    // stream). Same engine-exact estimate as x90, per group; the
    // exact count rides along as the accuracy report.
    "x96_hll_by_group" -> Q(
      s"""WITH t AS (SELECT event_type,
         |    CAST(user_id AS VARCHAR) AS w FROM events),
         |h AS (SELECT event_type, ${TS.md5Long("w")} AS h FROM t),
         |b AS (SELECT event_type, h % $HllM AS bucket,
         |    h // $HllM AS rest FROM h),
         |r AS (SELECT event_type, bucket, max(${rhoSql("rest")}) AS r
         |  FROM b GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS occupied,
         |    sum(power(2.0, -r)) AS socc FROM r GROUP BY 1),
         |e AS (SELECT event_type, occupied, $HllM - occupied AS zeros,
         |    $HllAlphaM2 / (socc + ($HllM - occupied)) AS raw FROM a),
         |x AS (SELECT event_type, CAST(count(DISTINCT w) AS BIGINT)
         |    AS n_exact FROM t GROUP BY 1)
         |SELECT x.event_type, x.n_exact, e.occupied,
         |  CAST(e.zeros AS BIGINT) AS zeros,
         |  round(CASE WHEN raw <= ${2.5 * HllM} AND zeros > 0
         |    THEN $HllM * ln($HllM.0 / zeros) ELSE raw END, 4)
         |    AS hll_est
         |FROM x JOIN e USING (event_type)
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.spread(s, dir, "events")
        .select($"event_type", $"user_id".cast("string").as("w"))
      val est = hllEstimateBy(
        hllRegistersBy(ev, Seq("event_type")), Seq("event_type"))
      ev.groupBy($"event_type")
        .agg(count_distinct($"w").as("n_exact"))
        .join(est, "event_type")
        .orderBy($"event_type")
    },
    // ----- x64 count-min-sketch frequency estimates: build the D×W
    // counter matrix from the token stream, then estimate every vocab
    // term and report est vs exact (overcount = est - true ≥ 0 by
    // construction). Exact-integer counters → hash-exact oracle.
    "x64_cms_counts" -> Q(
      s"""WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
         |    '[a-z]+')) AS w FROM documents),
         |hr AS (SELECT w, unnest(range(0, $D)) AS d FROM t),
         |cnt AS (SELECT d, ${bucketSql("d", "w")} AS b,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM hr GROUP BY 1, 2),
         |tru AS (SELECT w, CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM t GROUP BY 1),
         |vh AS (SELECT w, d, ${bucketSql("d", "w")} AS b
         |  FROM (SELECT w, unnest(range(0, $D)) AS d FROM tru)),
         |est AS (SELECT w, min(c) AS est FROM vh JOIN cnt USING (d, b)
         |  GROUP BY 1)
         |SELECT w AS term, est, true_cnt, est - true_cnt AS overcount
         |FROM est JOIN tru USING (w) ORDER BY term""".stripMargin) {
      (s, dir) =>
        val toks = tokensOf(Tables.spread(s, dir, "documents"))
        val bucket = T.md5Long(concat($"d".cast("string"), lit(":"), $"w"))
          .%(W)
        // sketch build: fixed 512-cell shuffle, token stream never moves
        val cnt = cmsCounters(toks)
        val tru = toks.groupBy($"w").agg(count(lit(1)).as("true_cnt"))
        val est = tru
          .select($"w", explode(sequence(lit(0), lit(D - 1))).as("d"))
          .select($"w", $"d", bucket.as("b"))
          .join(broadcast(cnt), Seq("d", "b"))
          .groupBy($"w").agg(min($"c").as("est"))
        est.join(tru, Seq("w"))
          .select($"w".as("term"), $"est", $"true_cnt",
            ($"est" - $"true_cnt").as("overcount"))
          .orderBy($"term")
    })
}
