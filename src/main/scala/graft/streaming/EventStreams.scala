package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double)
final case class FunnelReach(user_id: Long, reached: Int)
private final case class FunnelBuf(evs: Seq[(Long, String)])
final case class RetentionDays(user_id: Long, cohort_day: String, offsets: Seq[Long])
private final case class DayBuf(days: Seq[Long], emitted: Boolean)
final case class SessionUpdate(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Long, sum_value: Double)
private final case class SessionBuf(start: Long, end: Long, n: Long, sum: Double)

/** Structured Streaming operators over the events stream — the
  * streaming analog of the batch queries in [[graft.Queries]], and the
  * engine's answer to the reference's unbounded-command-loop shape
  * (SURVEY O27 maps the *session* part; these cover event-time
  * analytics the reference lacks entirely).
  *
  * Both transforms are source-agnostic: feed them a `readStream` from
  * Kafka/files in production or a MemoryStream in tests. State is kept
  * by the engine's checkpointing; at scale the shuffle is keyed by
  * user/window exactly like the batch plan, so the same partitioning
  * reasoning applies.
  */
object EventStreams {

  /** Tumbling 1-hour event-time windows with a 2-hour watermark:
    * counts + sums per (window, event_type). Late rows beyond the
    * watermark are dropped — the knob the reference has no concept of.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes with a 1-hour watermark —
    * the streaming twin of the oracle-checked batch query
    * Queries.eventsSliding, same (window, event_type) grain and
    * aggregates. In append mode a window reaches the sink exactly once,
    * when the watermark passes its end — so a bounded replay whose last
    * row pushes the watermark beyond every real window produces the
    * batch result exactly (how the events_sliding_stream correctness
    * query equates the two plans).
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup by key with BOUNDED state: the watermark
    * lets the engine drop seen-key state older than the horizon, so
    * memory tracks the key-arrival rate, not the stream's lifetime —
    * the streaming half of the training-pipeline dedup story
    * ([[graft.dedup.Dedup.exactStats]] is the batch half).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Content-level streaming dedup: first occurrence of each payload
    * digest wins (md5 over the props payload — digests, never raw
    * payloads, reach the state store). */
  def dedupedByContent(events: DataFrame): DataFrame =
    events
      .withColumn("content_hash", md5(col("props")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-static enrichment join: each micro-batch joins against the
    * (broadcastable) customer dimension — no stream-side state at all,
    * the standard fact-stream × dim-table shape.
    */
  def enrichedWithSegment(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"), "left")
      .drop("c_custkey")

  /** Watermarked stream-stream interval join: each purchase joins the
    * same user's clicks from the preceding hour — streaming
    * attribution, the canonical two-stream join shape (here a
    * self-join: both sides derive from the one events stream). Both
    * sides carry event-time watermarks and the join condition bounds
    * the event-time distance, so the state store evicts rows once the
    * watermark passes their reachable window — state is bounded by
    * interval × arrival rate, not stream lifetime, which is what lets
    * the join run indefinitely at 100 TB ingest. Inner-join matches
    * are emitted eagerly in append mode; the watermark governs only
    * state eviction and late-row drops.
    *
    * The two sides are CALLER-FILTERED inputs, and the watermark is
    * applied here, ABOVE whatever the caller passed. That ordering is
    * load-bearing: a `.where` placed after `withWatermark` gets pushed
    * below the EventTimeWatermark node by Catalyst (the predicate
    * doesn't reference the event-time column), after which the
    * watermark tracker only ever sees post-filter rows — a replay's
    * out-of-band watermark-release row would silently stop advancing
    * the watermark and delayed outer results would never emit.
    */
  def clickAttribution(clicks0: DataFrame, purchases0: DataFrame,
                       joinType: String = "inner"): DataFrame = {
    val clicks = clicks0
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = purchases0
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("click_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"),
      joinType)
  }

  /** LEFT-OUTER variant of [[clickAttribution]]: purchases with no
    * qualifying click still surface (click columns null) — but only
    * once the watermark passes the end of their match window, since
    * until then a matching click could still arrive. That delayed
    * null-emission is the semantic the inner join never exercises: it
    * rides the no-data micro-batch Spark schedules when the watermark
    * advances, the same machinery that releases append-mode windows.
    */
  def clickAttributionOuter(clicks0: DataFrame, purchases0: DataFrame): DataFrame =
    clickAttribution(clicks0, purchases0, "leftOuter")

  /** Gap-based session windows (30 min inactivity) via
    * flatMapGroupsWithState with event-time timeout: the streaming twin
    * of [[graft.Queries.eventsSessionize]]. Emits one row per closed
    * session. State per user is O(1) (a running buffer), so the
    * operator scales with distinct active users, not event volume.
    */
  /** Ordered-funnel progression per user as a stream: how far did each
    * user get through view → click → purchase, with every later step
    * required STRICTLY AFTER the first reach of the previous one (the
    * batch recurrence of Queries.eventsFunnel). The fold is not
    * monotone under out-of-order arrival — a late-but-earlier view
    * legitimately changes which clicks qualify — so no incremental
    * state update exists; instead the user's STEP events are buffered
    * until the event-time watermark closes the user (timeout), then
    * folded once in time order. State is bounded by one user's
    * step-event count inside the watermark horizon — active-user
    * scaling, not event-volume scaling, and only whitelisted step
    * types are ever buffered. Emits (user_id, reached ∈ 1..steps)
    * for users who reached at least step 1.
    */
  def funnelReach(spark: SparkSession, events: Dataset[Event],
                  steps: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelReach] = {
    import spark.implicits._
    val stepSet = steps.toSet
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelReach](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val evs = state.getOption.map(_.evs).getOrElse(Seq.empty)
            state.remove()
            var reached = 0
            var cut = Long.MinValue
            steps.indices.foreach { i =>
              if (reached == i) {
                val cand = evs.collect {
                  case (t, s) if s == steps(i) && (i == 0 || t > cut) => t
                }
                if (cand.nonEmpty) { reached = i + 1; cut = cand.min }
              }
            }
            if (reached > 0) Iterator.single(FunnelReach(uid, reached))
            else Iterator.empty
          } else {
            val add = rows.filter(e => stepSet(e.event_type))
              .map(e => (e.ts.getTime, e.event_type)).toSeq
            val buf = state.getOption.map(_.evs).getOrElse(Seq.empty) ++ add
            if (buf.nonEmpty) {
              state.update(FunnelBuf(buf))
              // strictly above the current watermark, else the engine
              // rejects the timeout; the replay's sentinel then drives
              // the watermark past it and fires the fold
              state.setTimeoutTimestamp(
                math.max(buf.iterator.map(_._1).max + 1, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  /** Day-N retention per user as a stream: active days accumulate in
    * state (a deduplicated day-set, not events) and the user's
    * retention row emits ONCE, when the event-time watermark passes
    * the END of their observation window (cohort + horizonDays + 1
    * day) — the point at which day-N retention is FINAL by
    * definition: any later activity lands past the horizon. The
    * cohort assignment is permanent, so after emission the state is
    * kept as a tombstone (empty day-set, emitted flag) rather than
    * removed — late-resurfacing activity must not mint a second, later
    * cohort. This is the honest state bound of retention analytics:
    * lifetime-users-sized (one tombstone per user ever seen — the
    * same users-sized table the batch twin materializes), while the
    * PRE-emission day-set is bounded by horizonDays + the watermark
    * slack. Events below the watermark are dropped by the engine, so
    * a post-emission arrival can only carry offsets past the horizon
    * — ignoring it is exact, not approximate.
    */
  def retentionDays(spark: SparkSession, events: Dataset[Event],
                    horizonDays: Long = 7L): Dataset[RetentionDays] = {
    import spark.implicits._
    val msPerDay = 24L * 3600 * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DayBuf, RetentionDays](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[DayBuf]) =>
          if (state.hasTimedOut) {
            val days = state.getOption.map(_.days).getOrElse(Seq.empty)
            // tombstone: the cohort row is final; keep state, no timeout
            state.update(DayBuf(Seq.empty, emitted = true))
            if (days.isEmpty) Iterator.empty
            else {
              val cohort = days.min
              val offsets = days.map(_ - cohort).filter(_ <= horizonDays).sorted
              Iterator.single(RetentionDays(uid,
                java.time.LocalDate.ofEpochDay(cohort).toString, offsets))
            }
          } else {
            val prior = state.getOption
            if (prior.exists(_.emitted)) Iterator.empty // final; ignore
            else {
              // epoch days in the pinned-UTC session (wall-clock IS UTC)
              val add = rows.map(e => Math.floorDiv(e.ts.getTime, msPerDay)).toSeq
              val days = (prior.map(_.days).getOrElse(Seq.empty) ++ add).distinct
              if (days.nonEmpty) {
                state.update(DayBuf(days, emitted = false))
                // fire when the observation window closes
                state.setTimeoutTimestamp(
                  math.max((days.min + horizonDays + 1) * msPerDay,
                    state.getCurrentWatermarkMs() + 1))
              }
              Iterator.empty
            }
          }
      }
  }

  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMillis: Long = 30L * 60 * 1000): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(b =>
              SessionUpdate(userId, new Timestamp(b.start), new Timestamp(b.end), b.n, b.sum))
            state.remove()
            closed.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var buf = state.getOption
            val out = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              val t = e.ts.getTime
              buf match {
                // inclusive <=: an event at EXACTLY gap distance merges
                // into the running session — session_window's observed
                // convention, shared by the batch lag form and the
                // DuckDB oracle (pinned in SessionStreamingSpec)
                case Some(b) if t - b.end <= gapMillis =>
                  buf = Some(SessionBuf(b.start, math.max(b.end, t), b.n + 1, b.sum + e.value))
                case Some(b) =>
                  out += SessionUpdate(userId, new Timestamp(b.start), new Timestamp(b.end), b.n, b.sum)
                  buf = Some(SessionBuf(t, t, 1, e.value))
                case None =>
                  buf = Some(SessionBuf(t, t, 1, e.value))
              }
            }
            buf.foreach { b =>
              state.update(b)
              state.setTimeoutTimestamp(b.end + gapMillis)
            }
            out.result().iterator
          }
      }
  }
}
