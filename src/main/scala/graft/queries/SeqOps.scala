package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.StringToColumn
import graft.functions.{TextSql => TS}

/** Sequence/ordering operators a training-data pipeline needs beyond the
  * reference's own surface: distributed as-of join, context-window
  * packing, and PII-style redaction. All pure relational plans with
  * exact DuckDB oracles.
  */
object SeqOps {

  /** Context-window capacity for x17 packing (tokens per bin). */
  private val Cap = 2048L

  val qs: Map[String, Q] = Map(
    // ----- x16 as-of join: for every 'click' event, the most recent
    // 'view' event of the same user at-or-before it. Implemented as the
    // union-tag + running last_value formulation: ONE shuffle on
    // user_id + one sort — the scalable shape (a range join explodes
    // quadratically per user; Spark has no native as-of). Ties resolve
    // right-before-left at equal ts, larger rid first among equal-ts
    // rights — encoded in the (ts, tag, rid) sort key in BOTH engines.
    "x16_asof" -> Q(
      """WITH r AS (SELECT user_id, ts, event_id AS rid FROM events
        |  WHERE event_type = 'view'),
        |l AS (SELECT user_id, ts, event_id AS lid FROM events
        |  WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, ts, 0 AS tag, rid, NULL AS lid FROM r
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS tag, NULL AS rid, lid FROM l),
        |w AS (SELECT user_id, ts, tag, lid,
        |    last_value(rid IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts, tag, coalesce(rid, -1)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |  FROM u)
        |SELECT CAST(lid AS BIGINT) AS lid, user_id,
        |  CAST(coalesce(rid, -1) AS BIGINT) AS rid
        |FROM w WHERE tag = 1 ORDER BY lid""".stripMargin) { (s, dir) =>
      // one scan with an IN filter + conditional tag projection (a
      // union of two filtered scans would read the table twice)
      val tagged = Tables(s, dir, "events")
        .filter($"event_type".isin("view", "click"))
        .select($"user_id", $"ts",
          when($"event_type" === "view", 0).otherwise(1).as("tag"),
          when($"event_type" === "view", $"event_id").as("rid"),
          when($"event_type" === "click", $"event_id").as("lid"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"tag", coalesce($"rid", lit(-1L)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("asof_rid", last($"rid", ignoreNulls = true).over(w))
        .filter($"tag" === 1)
        .select($"lid", $"user_id",
          coalesce($"asof_rid", lit(-1L)).as("rid"))
        .orderBy($"lid")
    },

    // ----- x17 context-window packing: assign docs (by token count) to
    // fixed-capacity bins in doc_id order per source — the fractional
    // (straddle-allowed) packing whose bin id is a pure function of the
    // running token count, so it stays a single window over one
    // shuffle-on-source. (Greedy reset-on-overflow packing is
    // inherently sequential per group; this is the form that scales.)
    "x17_pack" -> Q(
      s"""WITH t AS (SELECT doc_id, source,
         |  CAST(len(${TS.wsTokens("text")}) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT doc_id, source, n,
         |  CAST(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS cum
         |  FROM t)
         |SELECT doc_id, source, n, cum // $Cap AS bin,
         |  cum - (cum // $Cap) * $Cap AS off
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .select($"doc_id", $"source",
          size(graft.functions.TextExprs.wsTokens($"text")).cast("long")
            .as("n"))
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("cum", coalesce(sum($"n").over(w), lit(0L)))
        .select($"doc_id", $"source", $"n",
          expr(s"cum div $Cap").as("bin"),
          ($"cum" - expr(s"cum div $Cap") * Cap).as("off"))
        .orderBy($"doc_id")
    },

    // ----- x18 PII-style scrub: global regex redaction of digit runs
    // and email-shaped tokens + match counts; the redacted text ships
    // as an md5 fingerprint so the oracle checks the FULL redaction
    // byte-for-byte. Pure projection — zero shuffle, codegen'd.
    "x18_scrub" -> Q(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
        |    AS n_nums,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+')) AS BIGINT) AS n_emails,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g')) AS scrub_fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val email = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
      Tables(s, dir, "documents").select($"doc_id",
        size(regexp_extract_all($"text", lit("[0-9]+"), lit(0)))
          .cast("long").as("n_nums"),
        size(regexp_extract_all($"text", lit(email), lit(0)))
          .cast("long").as("n_emails"),
        md5(regexp_replace(regexp_replace($"text", email, "<EMAIL>"),
          "[0-9]+", "<NUM>")).as("scrub_fp"))
        .orderBy($"doc_id")
    })
}
