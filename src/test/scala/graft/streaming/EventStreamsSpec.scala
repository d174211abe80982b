package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

case class TestEvent(ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class CepTestEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
case class IdEvent(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

class EventStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  private def runStream(name: String, df: org.apache.spark.sql.DataFrame,
      mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling windows aggregate streamed events per hour and type") {
    val input = MemoryStream[TestEvent](spark)
    input.addData(
      TestEvent(t(5), 1, "click", 1.0),
      TestEvent(t(20), 1, "click", 2.0),
      TestEvent(t(65), 2, "view", 5.0))
    runStream("tumbling_out", EventStreams.tumbling(input.toDF()), OutputMode.Complete())
    val rows = spark.table("tumbling_out")
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(rows == Seq(
      (t(0), "click", 2L, 3.0),
      (t(60), "view", 1L, 5.0)))
  }

  test("sliding windows place each event in 4 overlapping windows") {
    val input = MemoryStream[TestEvent](spark)
    input.addData(TestEvent(t(50), 1, "click", 1.0))
    runStream("sliding_out", EventStreams.sliding(input.toDF()), OutputMode.Complete())
    val starts = spark.table("sliding_out")
      .orderBy("window_start")
      .select("window_start").as[Timestamp].collect().toSeq
    assert(starts == Seq(t(0), t(15), t(30), t(45)))
  }

  test("session windows merge events within the gap and split across it") {
    val input = MemoryStream[TestEvent](spark)
    input.addData(
      // user 1: two events 10 min apart (one session), then a 40-min gap
      TestEvent(t(0), 1, "click", 1.0),
      TestEvent(t(10), 1, "click", 2.0),
      TestEvent(t(50), 1, "click", 4.0),
      // user 2: single event
      TestEvent(t(5), 2, "view", 8.0))
    runStream("sessions_out", EventStreams.sessions(input.toDF()), OutputMode.Complete())
    val rows = spark.table("sessions_out")
      .orderBy("user_id", "session_start")
      .as[(Timestamp, Long, Long, Double)].collect().toSeq
    assert(rows == Seq(
      (t(0), 1L, 2L, 3.0),
      (t(50), 1L, 1L, 4.0),
      (t(5), 2L, 1L, 8.0)))
  }

  test("flatMapGroupsWithState sessionizer: gap-close and timeout-close") {
    val input = MemoryStream[TestEvent](spark)
    val sessions = EventStreams.sessionsWithState(
      input.toDF(), watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("fmgws_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 session of two events; user 2 single event
    input.addData(
      TestEvent(t(0), 1, "click", 1.0),
      TestEvent(t(10), 1, "click", 2.0),
      TestEvent(t(12), 2, "view", 8.0))
    q.processAllAvailable()
    // batch 2: a later user-1 event PAST the 30-min gap closes the first
    // session inline (gap-close path)
    input.addData(TestEvent(t(60), 1, "click", 4.0))
    q.processAllAvailable()
    // batches 3+4: push the watermark far ahead so event-time timeouts fire
    // (timeouts are evaluated against the PREVIOUS batch's watermark, hence
    // two batches)
    input.addData(TestEvent(t(600), 3, "click", 0.5))
    q.processAllAvailable()
    input.addData(TestEvent(t(610), 3, "click", 0.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fmgws_out")
      .as[(Long, java.sql.Timestamp, Long, Double, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2.getTime))
    // user 1: first session (2 events, 600s, sum 3.0) closed by the gap;
    // second session (1 event at t60) closed by timeout.
    // user 2: single-event session closed by timeout.
    assert(rows.map(r => (r._1, r._3, r._4, r._5)).contains((1L, 2L, 600.0, 3.0)))
    assert(rows.map(r => (r._1, r._3, r._5)).contains((1L, 1L, 4.0)))
    assert(rows.map(r => (r._1, r._3, r._5)).contains((2L, 1L, 8.0)))
  }

  test("stream-stream join attributes purchases to clicks within the horizon") {
    val clicks = MemoryStream[TestEvent](spark)
    val purchases = MemoryStream[TestEvent](spark)
    clicks.addData(
      TestEvent(t(10), 1, "click", 1.0),   // within 1h of the purchase → match
      TestEvent(t(20), 1, "click", 2.0),   // within 1h → match
      TestEvent(t(300), 1, "click", 3.0),  // AFTER the purchase → no match
      TestEvent(t(15), 2, "click", 4.0))   // other user → no match for user 1
    purchases.addData(TestEvent(t(60), 1, "purchase", 50.0))
    val joined = EventStreams.clickPurchaseAttribution(
      clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_out")
      .orderBy("click_ts")
      .as[(Long, Timestamp, Timestamp, Double, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, t(60), t(10), 50.0, 1.0),
      (1L, t(60), t(20), 50.0, 2.0)))
  }

  test("stream-stream LEFT OUTER join: click-less purchase emits null-padded only after the watermark proves it") {
    val clicks = MemoryStream[TestEvent](spark)
    val purchases = MemoryStream[TestEvent](spark)
    clicks.addData(TestEvent(t(10), 1, "click", 1.0))
    purchases.addData(
      TestEvent(t(60), 1, "purchase", 50.0),  // has a click → matches now
      TestEvent(t(60), 2, "purchase", 70.0))  // click-less → watermark-delayed
    val q = EventStreams.clickPurchaseAttributionOuter(
      clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val early = spark.table("attr_outer_out").collect()
    // the matched row may emit promptly; the null-padded row MUST NOT —
    // a matching click could still be in flight until the watermark passes
    assert(!early.exists(_.isNullAt(2)),
      s"null-padded row emitted before the watermark proved it: ${early.mkString(", ")}")
    // advance BOTH watermarks (global watermark = min of the two sides)
    // far past purchase_ts: no older click can now appear
    clicks.addData(TestEvent(t(300), 9, "click", 0.0))
    purchases.addData(TestEvent(t(300), 9, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_outer_out")
      .filter(org.apache.spark.sql.functions.col("purchase_ts") === t(60))
      .select("user_id", "purchase_ts", "click_ts", "purchase_value", "click_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet
    assert(rows == Set(
      (1L, t(60), Some(t(10)), 50.0, Some(1.0)),
      (2L, t(60), None, 70.0, None)), s"got $rows")
  }

  test("streaming dedup suppresses duplicate ids within the watermark horizon") {
    val input = MemoryStream[IdEvent](spark)
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: id 1 twice in the same batch, id 2 once
    input.addData(
      IdEvent(1, t(0), 1, 1.0),
      IdEvent(1, t(1), 1, 1.0),
      IdEvent(2, t(2), 1, 2.0))
    q.processAllAvailable()
    // batch 2: id 1 again (redelivery across batches) + a new id
    input.addData(IdEvent(1, t(3), 1, 1.0), IdEvent(3, t(4), 2, 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("append mode drops events later than the watermark") {
    val input = MemoryStream[TestEvent](spark)
    val agg = EventStreams.tumbling(input.toDF(), watermark = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: event at 02:05 → watermark advances to 01:35, finalizing the
    // 00:00 and 01:00 windows
    input.addData(TestEvent(t(125), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: hopelessly late event for the already-closed 00:00 window
    input.addData(TestEvent(t(5), 1, "click", 99.0))
    q.processAllAvailable()
    // batch 3: push the watermark past 03:00 so the 02:00 window emits
    input.addData(TestEvent(t(230), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("late_out")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    // the late 00:05 event was dropped: no 00:00 window in the output
    assert(emitted.map(_._1).contains(t(120)))
    assert(!emitted.map(_._1).contains(t(0)))
  }

  test("conversionMatcher: streamed CEP status equals the batch regex operator under in-order delivery") {
    val dir = "/root/testdata/sf0.001"
    // the real corpus, replayed in event-time order across three batches
    val raw = graft.ops.Tables(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => CepTestEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[CepTestEvent](spark)
    val q = EventStreams.conversionMatcher(input.toDF())
      .writeStream.format("memory").queryName("cep_out")
      .outputMode(OutputMode.Update()).start()
    for (chunk <- raw.grouped((raw.length + 2) / 3)) {
      input.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // latest status per user (max n_events) vs the batch operator
    val streamed = spark.table("cep_out").as[(Long, Long, Boolean)].collect()
      .groupBy(_._1).map { case (u, rows) => rows.maxBy(_._2) }
      .map(r => (r._1, r._2, r._3)).toSet
    val batch = graft.ops.Events.sequenceMatchConversions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamed == batch, "stream must equal batch under in-order delivery")
    assert(streamed.exists(_._3) && streamed.exists(!_._3))
    // stickiness: once a user converts, every later status stays converted
    val perUser = spark.table("cep_out").as[(Long, Long, Boolean)].collect()
      .groupBy(_._1)
    for ((_, rows) <- perUser) {
      val ordered = rows.sortBy(_._2).map(_._3)
      assert(!ordered.zip(ordered.tail).exists { case (a, b) => a && !b },
        "converted un-matched later")
    }
  }
}
