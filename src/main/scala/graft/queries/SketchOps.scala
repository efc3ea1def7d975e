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

  val qs: Map[String, Q] = Map(
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
