package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.StringToColumn

/** Event-stream operators over the `events` table, run here in batch
  * mode with exact DuckDB oracles. The same logic runs incrementally as
  * Structured Streaming in `graft.streaming` (watermark + window, and
  * flatMapGroupsWithState sessionization) — SURVEY §2.11's mapping of
  * the reference's request/response surface onto a job-queue stream.
  *
  * Scale notes: e1 is a single shuffle on (window, event_type) with
  * partial aggregation; e2 is a single shuffle on user_id (the window
  * functions and the session rollup share the same partitioning, so
  * Catalyst plans one Exchange).
  */
object EventOps {

  private val GapMicros = 1800000000L // 30 min session gap

  val qs: Map[String, Q] = Map(
    // ----- e1 tumbling-window aggregate (streaming twin: watermark+window)
    "e1_window_agg" -> Q(
      """SELECT date_trunc('hour', ts) AS win, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window($"ts", "1 hour").getField("start").as("win"),
          $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
        .orderBy($"win", $"event_type")
    },

    // ----- e2 sessionization: 30-min-gap sessions via lag + running sum
    // (streaming twin: flatMapGroupsWithState with event-time timeout)
    "e2_sessionize" -> Q(
      """WITH x AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
        |    AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, value, sum(new_s) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
        |    AS duration_s,
        |  round(sum(value), 2) AS total
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val prev = lag(unix_micros($"ts"), 1).over(w)
      Tables(s, dir, "events")
        .withColumn("new_s",
          when(prev.isNull || unix_micros($"ts") - prev > GapMicros, 1)
            .otherwise(0))
        .withColumn("sid", sum($"new_s")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid".as("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max($"ts").cast("long") - min($"ts").cast("long"))
            .as("duration_s"),
          round(sum($"value"), 2).as("total"))
        .orderBy($"user_id", $"session_id")
    },

    // ----- e3 rollup (multi-level aggregate, free from Spark SQL —
    // SURVEY §2.4 "grouping sets, cube, rollup")
    "e3_rollup" -> Q(
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(CAST(date_part('hour', ts) AS BIGINT), -1) AS hr,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY ROLLUP (event_type, CAST(date_part('hour', ts) AS BIGINT))
        |ORDER BY event_type, hr""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .rollup($"event_type", hour($"ts").cast("long").as("hr"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
        .select(coalesce($"event_type", lit("ALL")).as("event_type"),
          coalesce($"hr", lit(-1L)).as("hr"), $"n", $"total")
        .orderBy($"event_type", $"hr")
    })
}
