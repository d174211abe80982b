package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ops.TimeSeries

case class SketchTestEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class SketchStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def ev(id: Long, day: Int, user: Long, tpe: String) = SketchTestEvent(
    id, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), user, tpe, 1.0, "{}")

  test("streamed sketch view serves rolling DAU EQUAL to the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("skv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("skv_ckpt").toString
    val input = MemoryStream[SketchTestEvent](spark)
    val q = SketchStreams.maintainDau(input.toDF(), dir, ckpt)
    val all = scala.collection.mutable.ArrayBuffer.empty[SketchTestEvent]

    def checkAgainstBatch(): Unit = {
      val got = SketchStreams.currentRolling(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = TimeSeries
        .rollingFromDailySketches(TimeSeries.dailySketches(all.toSeq.toDF()))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // hll_union_agg is register-wise max: merge order cannot change the
      // registers, so streamed == batch exactly, not just in envelope
      assert(got == want, s"stream diverges from batch:\n$got\nvs\n$want")
    }

    // batch 1: two days, overlapping users across types
    val b1 = Seq(ev(1, 1, 100, "view"), ev(2, 1, 101, "view"),
      ev(3, 2, 100, "view"), ev(4, 2, 200, "click"))
    all ++= b1; input.addData(b1: _*); q.processAllAvailable()
    checkAgainstBatch()

    // batch 2: re-touches day 1 (the merge path, not just append) and
    // extends the calendar
    val b2 = Seq(ev(5, 1, 102, "view"), ev(6, 3, 100, "view"),
      ev(7, 3, 101, "click"), ev(8, 9, 300, "view"))
    all ++= b2; input.addData(b2: _*); q.processAllAvailable()
    checkAgainstBatch()
    q.stop()

    // state is calendar-sized: one row per (type, active day), not per user
    val view = SketchStreams.currentView(spark, dir)
    val cells = all.map(e => (e.event_type,
      e.ts.toLocalDateTime.toLocalDate)).distinct.size
    assert(view.count() == cells, "view rows = (type, day) cells")

    // retention: at most two version directories survive
    val versions = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
    assert(versions.length <= 2)
  }

  test("streamed BITMAP view serves rolling DAU equal to batch AND to the exact per-user count") {
    val dir = java.nio.file.Files.createTempDirectory("bmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bmv_ckpt").toString
    val input = MemoryStream[SketchTestEvent](spark)
    val q = SketchStreams.maintainDauBitmap(input.toDF(), dir, ckpt)
    val all = scala.collection.mutable.ArrayBuffer.empty[SketchTestEvent]

    def check(): Unit = {
      val got = SketchStreams.currentRollingBitmap(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // exact ground truth, computed per-user in memory: for each (type,
      // day in corpus calendar), distinct users active in [day-6, day]
      val acts = all.map(e => (e.event_type, e.ts.toLocalDateTime.toLocalDate, e.user_id))
      val maxDay = acts.map(_._2).max
      val want = (for {
        t <- acts.map(_._1).distinct
        d <- acts.filter(_._1 == t).map(_._2).distinct
          .flatMap(d0 => (0 to 6).map(d0.plusDays(_))).distinct
        if !d.isAfter(maxDay)
        users = acts.filter(a => a._1 == t && !a._2.isAfter(d)
          && !a._2.isBefore(d.minusDays(6))).map(_._3).distinct
        if users.nonEmpty
      } yield (t, d.toString) -> users.size.toLong).toMap
      assert(got == want, s"bitmap stream diverges from exact:\n$got\nvs\n$want")
    }

    val b1 = Seq(ev(1, 1, 100, "view"), ev(2, 1, 101, "view"),
      ev(3, 2, 100, "view"), ev(4, 2, 200, "click"))
    all ++= b1; input.addData(b1: _*); q.processAllAvailable()
    check()
    // batch 2 re-touches day 1 (merge path) and repeats user 100 on day 1
    // (the idempotence path: OR absorbs the duplicate activity)
    val b2 = Seq(ev(5, 1, 102, "view"), ev(6, 1, 100, "view"),
      ev(7, 3, 101, "click"), ev(8, 9, 300, "view"))
    all ++= b2; input.addData(b2: _*); q.processAllAvailable()
    check()
    q.stop()

    // state is (type, day, segment)-sized; these users span 2 segments
    // (100..102 in seg 3, 200 in seg 6, 300 in seg 9)
    val view = SketchStreams.currentView(spark, dir)
    val cells = all.map(e => (e.event_type,
      e.ts.toLocalDateTime.toLocalDate, e.user_id / 32)).distinct.size
    assert(view.count() == cells, "view rows = (type, day, segment) cells")
  }

  test("replayed sketch fold is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("skv_replay").toString
    val b0 = Seq(ev(1, 1, 100, "view"), ev(2, 1, 101, "view")).toDF()
    val b1 = Seq(ev(3, 2, 100, "view"), ev(4, 2, 102, "view")).toDF()
    SketchStreams.foldBatch(b0, 0, dir)
    SketchStreams.foldBatch(b1, 1, dir)
    val first = SketchStreams.currentRolling(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    SketchStreams.foldBatch(b1, 1, dir)
    val second = SketchStreams.currentRolling(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(first == second, "replay changed the served estimates")
  }
}
