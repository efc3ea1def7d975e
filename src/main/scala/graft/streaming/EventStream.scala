package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.StringToColumn

/** One event row (the `events` testdata schema). */
final case class Event(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** A closed session emitted by the stateful sessionizer. */
final case class Session(
    user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
    n_events: Long, total: Double)

/** Structured Streaming operators over an event stream (SURVEY §2.11).
  *
  * Batch twins with DuckDB oracles live in `graft.queries.EventOps`;
  * these run the same logic incrementally. Works on any streaming
  * DataFrame (file source, Kafka, MemoryStream in tests) — state is
  * bounded by the watermark, so the plan is stable at any input rate:
  * the only shuffle is on the group key, and expired state is dropped
  * by event-time, never accumulated.
  */
object EventStream {

  /** Tumbling-window counts/sums with a watermark: late events beyond
    * `watermark` are dropped; window state is purged once the watermark
    * passes the window end (bounded state at 100 TB/day rates). */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", windowLen), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"window.start".as("win"), $"event_type", $"n", $"total")

  /** Hopping (sliding) window counts/sums: the e5 batch query run
    * incrementally. The window generator emits size/slide windows per
    * event BEFORE the aggregation exchange, so map-side partials and
    * watermark-driven state eviction work exactly as in the tumbling
    * case — state is O(open windows), not O(stream). */
  def hoppingCounts(events: DataFrame, watermark: String = "1 hour",
      windowLen: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", windowLen, slide), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"window.start".as("win"), $"event_type", $"n", $"total")

  /** Stream-static enrichment join: the streaming side joins a static
    * dimension (user tier, source metadata...) per micro-batch with the
    * dimension BROADCAST — the stream itself never shuffles and the
    * join holds no state. The static side is re-read per batch, so a
    * dimension table updated in place is picked up without restarting
    * the query. */
  def enrich(events: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Incremental event-transition counts (streaming twin of batch e6):
    * per user, remember only the LAST event; each arriving event emits
    * one (prev, next) pair. State is one (epoch, type) per user —
    * O(users) — and the downstream count per pair is an ordinary
    * streaming aggregation. Run in Update/Append per sink needs. */
  def transitions(events: Dataset[Event],
      watermark: String = "1 hour"): Dataset[Transition] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[LastEvent]) =>
          val out = Vector.newBuilder[Transition]
          var last = state.getOption
          rows.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            last.foreach(l => out += Transition(userId, l.tpe, e.event_type))
            last = Some(LastEvent(e.ts.getTime, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }

  // NOT private: Spark's generated (de)serializers must reach the ctor
  final case class LastEvent(epoch: Long, tpe: String)
  final case class Transition(user_id: Long, prev: String, next: String)

  private implicit val lastEventEnc: Encoder[LastEvent] =
    Encoders.product[LastEvent]
  private implicit val transitionEnc: Encoder[Transition] =
    Encoders.product[Transition]

  /** Streaming exact dedup: drops rows whose key was already seen,
    * keeping state only within the watermark horizon (the streaming
    * twin of the batch x5 hash-groupBy dedup — the form a continuous
    * training-data ingest pipeline needs). State is bounded: a key's
    * entry is evicted once the watermark passes its event time, so
    * at 100 TB/day the state store holds one horizon's keys, not the
    * stream's history. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  // NOT private: Spark's generated (de)serializers must reach the ctor
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  private implicit val sessionEnc: Encoder[Session] =
    Encoders.product[Session]
  private implicit val stateEnc: Encoder[SessionState] =
    Encoders.product[SessionState]

  // NOT private: Spark's generated (de)serializers must reach the ctor
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelStage(user_id: Long, stage: Int)

  private implicit val funnelStateEnc: Encoder[FunnelState] =
    Encoders.product[FunnelState]
  private implicit val funnelStageEnc: Encoder[FunnelStage] =
    Encoders.product[FunnelStage]

  /** Incremental ordered conversion funnel (streaming twin of the
    * batch e4 query): per user, track first view, first click after
    * it, first purchase after that; emit the user's current stage
    * (0-3) on every update. State is three epoch-millis longs per
    * user — O(users), independent of stream length. Run the query in
    * Update output mode. */
  def funnelStages(events: Dataset[Event],
      watermark: String = "1 hour"): Dataset[FunnelStage] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[FunnelState, FunnelStage](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0, 0, 0))
          rows.toArray.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" if s.t1 == 0 => s = s.copy(t1 = t)
              case "click" if s.t1 != 0 && s.t2 == 0 && t > s.t1 =>
                s = s.copy(t2 = t)
              case "purchase" if s.t2 != 0 && s.t3 == 0 && t > s.t2 =>
                s = s.copy(t3 = t)
              case _ => ()
            }
          }
          state.update(s)
          FunnelStage(userId, (if (s.t1 != 0) 1 else 0)
            + (if (s.t2 != 0) 1 else 0) + (if (s.t3 != 0) 1 else 0))
      }

  // NOT private: Spark's generated (de)serializers must reach the ctor
  final case class CohortPair(
      cohort: java.sql.Date, week_offset: Long, user_id: Long)
  final case class RetentionState(cohortDays: Long, seen: Array[Long])

  private implicit val cohortPairEnc: Encoder[CohortPair] =
    Encoders.product[CohortPair]
  private implicit val retentionStateEnc: Encoder[RetentionState] =
    Encoders.product[RetentionState]

  private def weekStartDays(ts: Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
      .`with`(java.time.temporal.TemporalAdjusters
        .previousOrSame(java.time.DayOfWeek.MONDAY))
      .toEpochDay

  /** Incremental weekly-cohort retention (streaming twin of batch e7):
    * per user, the state holds the cohort week (week of the earliest
    * event seen) and the set of week offsets already emitted; each
    * event emits its (cohort, week_offset, user) triple AT MOST ONCE,
    * so `groupBy(cohort, week_offset).count()` downstream IS e7's
    * n_users matrix — counting plain rows equals counting distinct
    * users because duplicates never leave the state function. State is
    * one date plus O(active weeks) longs per user.
    *
    * A late event EARLIER than the current cohort re-anchors the
    * user's cohort and re-emits the shifted offsets under the new
    * cohort (rows already emitted under the old cohort are append
    * facts and stay — the standard approximation of append-mode
    * incremental retention; in-order streams match batch e7 exactly,
    * which StreamingSpec pins cross-batch). */
  def retentionPairs(events: Dataset[Event],
      watermark: String = "1 hour"): Dataset[CohortPair] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[RetentionState, CohortPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[RetentionState]) =>
          def pair(cohortDays: Long, off: Long) = CohortPair(
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(cohortDays)),
            off, userId)
          val out = Vector.newBuilder[CohortPair]
          var st = state.getOption
          rows.toArray.sortBy(_.ts.getTime).foreach { e =>
            val wk = weekStartDays(e.ts)
            st match {
              case None =>
                st = Some(RetentionState(wk, Array(0L)))
                out += pair(wk, 0L)
              case Some(s) if wk < s.cohortDays =>
                val delta = (s.cohortDays - wk) / 7
                val shifted = (s.seen.map(_ + delta) :+ 0L).distinct.sorted
                st = Some(RetentionState(wk, shifted))
                shifted.foreach(o => out += pair(wk, o))
              case Some(s) =>
                val off = (wk - s.cohortDays) / 7
                if (!s.seen.contains(off)) {
                  st = Some(s.copy(seen = (s.seen :+ off).sorted))
                  out += pair(s.cohortDays, off)
                }
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }

  /** e7's aggregated cohort matrix, incrementally (Update mode): each
    * emitted pair is unique per user, so the plain count is the
    * distinct-user count. */
  def retentionCounts(events: Dataset[Event],
      watermark: String = "1 hour"): DataFrame =
    retentionPairs(events, watermark)
      .groupBy($"cohort", $"week_offset")
      .agg(count(lit(1)).as("n_users"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes when `gap` passes with no events (enforced by event-time
    * timeout against the watermark, so state size is O(active users)).
    * The reference has no streaming surface; this is the engine-native
    * generalization of its per-key batch grouping (G1/G2). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
      watermark: String = "1 hour"): Dataset[Session] = {
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.total))
          } else {
            // fold this batch's (sorted) events into the open session,
            // closing it whenever the gap is exceeded
            val closed = Vector.newBuilder[Session]
            var st = state.getOption
            rows.toArray.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              st match {
                case Some(s) if t - s.last <= gapMs =>
                  st = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  st = Some(SessionState(t, t, 1, e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked stream-stream interval join (the incremental twin of
    * batch `e8_interval_join`): views joined to same-user purchases
    * inside (view_ts, view_ts + joinWindow]. Both sides carry a
    * watermark AND the join condition bounds purchase time against view
    * time, so Spark derives a state-eviction horizon for EACH side —
    * a view is dropped from state once the purchase watermark passes
    * view_ts + joinWindow, a purchase once the view watermark passes
    * purchase_ts. State is O(events inside the watermark+window
    * horizon), never the stream history; the only shuffle is the
    * user_id hash partitioning both inputs already need.
    */
  def intervalJoin(views: DataFrame, purchases: DataFrame,
      watermark: String = "2 hours",
      joinWindow: String = "1 hour"): DataFrame = {
    val v = views
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("vts"))
      .withWatermark("vts", watermark)
    val p = purchases
      .select($"user_id".as("puid"), $"event_id".as("purchase_id"),
        $"ts".as("pts"), $"value")
      .withWatermark("pts", watermark)
    v.join(p, expr(
        s"user_id = puid AND pts > vts AND pts <= vts + interval $joinWindow"))
      .select($"user_id", $"view_id", $"purchase_id",
        ($"pts".cast("long") - $"vts".cast("long")).as("lag_s"),
        round($"value", 2).as("amount"))
  }

  /** LEFT OUTER stream-stream interval join (the incremental twin of
    * batch `e9_abandonment` before its rollup): matched (view,
    * purchase) pairs emit like [[intervalJoin]]; an UNMATCHED view
    * emits with null purchase columns — but only once the purchase
    * watermark passes view_ts + joinWindow, because until then a
    * matching purchase could still arrive. The state-eviction horizon
    * IS the completeness proof: Spark emits the null row exactly when
    * it can promise no match exists, so downstream abandonment counts
    * are final on arrival.
    */
  def intervalJoinOuter(views: DataFrame, purchases: DataFrame,
      watermark: String = "2 hours",
      joinWindow: String = "1 hour"): DataFrame = {
    val v = views
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("vts"))
      .withWatermark("vts", watermark)
    val p = purchases
      .select($"user_id".as("puid"), $"event_id".as("purchase_id"),
        $"ts".as("pts"), $"value")
      .withWatermark("pts", watermark)
    v.join(p, expr(
        s"user_id = puid AND pts > vts AND pts <= vts + interval $joinWindow"),
        "leftOuter")
      .select($"user_id", $"view_id", $"purchase_id",
        ($"pts".cast("long") - $"vts".cast("long")).as("lag_s"))
  }
}
