package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed rows for the custom-state sessionizer. */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
case class OpenSession(startMs: Long, lastMs: Long, n: Long, valueSum: Double)
case class SessionRecord(
    user_id: Long, session_start: Timestamp, n_events: Long,
    duration_sec: Double, value_sum: Double)

/** Typed rows for the streaming CEP matcher. */
case class CepEvent(user_id: Long, ts: Timestamp, event_id: Long, ch: String)
case class CepState(seq: String, n: Long, matched: Boolean)
case class CepStatus(user_id: Long, n_events: Long, converted: Boolean)

/** Structured Streaming variants of the batch [[graft.ops.Events]] shapes.
  *
  * Each function takes an unbounded DataFrame (from `readStream`) with the
  * events schema (`ts timestamp, user_id long, event_type string,
  * value double`) and returns a streaming aggregation. The batch versions in
  * `graft.ops.Events` run the SAME logical shapes eagerly; these add the two
  * things streaming needs:
  *
  *  - a watermark on `ts`, which bounds state (windows older than the
  *    watermark are finalized and evicted) and defines the late-data cutoff;
  *  - `session_window` for sessionization — the stateful generalization of
  *    the batch gaps-and-islands algorithm. Both split a user's events at
  *    >30-minute silences; the streaming form lets Spark merge/expire
  *    session state incrementally instead of requiring a total per-user
  *    sort.
  *
  * Scale notes: all three are single hash-aggregations keyed by
  * (window, key) — partial aggregation map-side, state store sharded by the
  * grouping key, so a 1000-executor cluster shards state horizontally. The
  * watermark keeps per-key state bounded regardless of stream length.
  */
object EventStreams {

  val DefaultWatermark = "2 hours"
  val SessionGap = "30 minutes" // == Events.SessionGapSeconds

  /** Tumbling 1-hour windows per event type: count + value sum. */
  def tumbling(events: DataFrame, watermark: String = DefaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("w.start").as("window_start"),
        col("event_type"), col("n"), col("value_sum"))

  /** Sliding windows: 1 hour long, every 15 minutes, per event type. */
  def sliding(events: DataFrame, watermark: String = DefaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Per-user sessions split at >30-minute gaps (built-in session_window
    * state: sessions merge as events arrive, finalize when the watermark
    * passes their close).
    */
  def sessions(events: DataFrame, watermark: String = DefaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), SessionGap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"), col("value_sum"))

  /** Custom-state sessionization via `flatMapGroupsWithState` — for
    * per-session logic `session_window` cannot express (custom eviction,
    * early emission, enrichment of the closing record). State = the one
    * open session per user; an event inside the gap extends it, an event
    * past the gap closes it (emitting a [[SessionRecord]]) and opens a new
    * one; the event-time timeout closes a session when the watermark passes
    * its gap horizon, so state stays bounded exactly like the built-in
    * session_window's.
    */
  def sessionsWithState(
      events: DataFrame,
      watermark: String = DefaultWatermark,
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionRecord] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(userId: Long, s: OpenSession): SessionRecord =
      SessionRecord(userId, new Timestamp(s.startMs), s.n,
        (s.lastMs - s.startMs) / 1000.0, s.valueSum)

    events.select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRecord](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (batch.isEmpty) {
            // timeout: the watermark passed the open session's gap horizon
            val out = state.getOption.map(close(userId, _)).iterator
            state.remove()
            out
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[SessionRecord]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(OpenSession(s.startMs, t, s.n + 1, s.valueSum + e.value))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  cur = Some(OpenSession(t, t, 1, e.value))
              }
            }
            val open = cur.get
            state.update(open)
            // timeout must be beyond the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(open.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }

  /** Stream–stream join: attribute each purchase to the same user's clicks
    * in the preceding `horizon` — the canonical streaming attribution
    * join. Both sides are watermarked and the join condition carries the
    * TIME-RANGE bound; together they let Spark compute how long a buffered
    * click can still match and EVICT it, so two unbounded streams join
    * with bounded state (an unconstrained stream–stream join would buffer
    * both streams forever — Spark rejects it in Append mode).
    *
    * Scale shape: state is sharded by the equi key (user_id), exactly like
    * the aggregation state stores; the range bound is the state-retention
    * contract.
    */
  def clickPurchaseAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      watermark: String = DefaultWatermark,
      horizon: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("click_ts"), col("purchase_value"), col("click_value"))
  }

  /** Stream–stream LEFT OUTER attribution — [[clickPurchaseAttribution]]
    * plus the rows that join can never show: purchases with NO qualifying
    * click. An outer stream–stream join is a genuinely different
    * capability from inner: a purchase cannot be declared click-less the
    * moment it arrives (a matching click may still be in flight), so
    * Spark holds it in state and emits the null-padded row only once the
    * WATERMARK proves no older click can appear — the unmatched side of
    * the result is inherently watermark-delayed, which is the semantics
    * the spec pins. Same bounded-state contract as the inner form: equi
    * key shards the state, the time-range bound sets eviction.
    */
  def clickPurchaseAttributionOuter(
      clicks: DataFrame,
      purchases: DataFrame,
      watermark: String = DefaultWatermark,
      horizon: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("click_ts"), col("purchase_value"), col("click_value"))
  }

  /** Streaming exact dedup on `event_id` — the ingest-side counterpart of
    * the batch dedup suite. `dropDuplicatesWithinWatermark` keys state by
    * the id and EVICTS each key once the watermark passes its event time,
    * so state is bounded by the watermark horizon (a plain
    * `dropDuplicates` on a stream would grow state forever). Duplicates
    * arriving within the horizon — the realistic at-least-once-delivery
    * case — are suppressed exactly.
    */
  def dedupEvents(events: DataFrame, watermark: String = DefaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CEP — the incremental twin of
    * [[graft.ops.Events.sequenceMatchConversions]]: per-user regex
    * matching over the growing event-type string, maintained as
    * `mapGroupsWithState` state. Each update emits the user's current
    * (n_events, converted) status; `converted` is STICKY (a matched
    * pattern cannot un-match — new events only append), so once true the
    * per-user string is dropped entirely and state collapses to a flag +
    * counter.
    *
    * State bound: unmatched users keep only the trailing `maxSeq`
    * characters — the standard CEP state/recall compromise (a match whose
    * span exceeds the window can be missed; the batch operator is the
    * exact anchor). Within a micro-batch events sort by (ts, event_id);
    * across batches the matcher is arrival-ordered, so stream ≡ batch
    * under in-order delivery (spec-pinned), the same contract as every
    * append-log CEP engine.
    */
  def conversionMatcher(events: DataFrame,
      maxSeq: Int = 4096): Dataset[CepStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    val pat = graft.ops.Events.ConversionPattern.r
    events.select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .as[CepEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[CepState, CepStatus](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[CepEvent], state: GroupState[CepState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prev = state.getOption.getOrElse(CepState("", 0L, matched = false))
          val n = prev.n + sorted.size
          if (prev.matched) {
            val next = CepState("", n, matched = true)
            state.update(next)
            CepStatus(userId, n, converted = true)
          } else {
            val seq = prev.seq + sorted.map(_.ch).mkString
            val matched = pat.findFirstIn(seq).isDefined
            state.update(CepState(
              if (matched) "" else seq.takeRight(maxSeq), n, matched))
            CepStatus(userId, n, matched)
          }
      }
  }
}
