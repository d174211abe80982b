package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("as-of picks the latest prior right row atomically — null payloads included") {
    // user 1 clicks: t1 (value 5.0), t2 (value NULL). The correct match for
    // an event at t3 is the t2 click WITH its null value — per-column
    // ignoreNulls filling would wrongly stitch t2's ts to t1's value.
    val left = Seq((10L, 1L, t(3)), (11L, 1L, t(1)), (12L, 2L, t(5)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t(1), Some(5.0)),
      (1L, t(2), None),
      (2L, t(9), Some(7.0))) // after user 2's event — must not match
      .toDF("user_id", "ts", "value")
    val out = AsofJoin.asofLastPrior(left, right, "user_id", "ts")
      .select("event_id", "asof_ts", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2))))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, Some(t(2)), None),       // latest prior is the NULL-valued click
      (11L, None, None),             // no prior click at all
      (12L, None, None)))            // right row exists but is later
  }

  test("strict inequality: a right row at exactly left.time is not matched") {
    val left = Seq((1L, 1L, t(5))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, t(5), 9.0)).toDF("user_id", "ts", "value")
    val out = AsofJoin.asofLastPrior(left, right, "user_id", "ts").head()
    assert(out.getAs[Any]("asof_value") == null)
  }


  test("forward as-of picks the earliest strictly-later click (negated-time reversal)") {
    val dir = "/root/testdata/sf0.001"
    val out = AsofJoin.asofNextClick(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val ev = Tables(spark, dir, "events")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val clicks = Tables(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.getTime).toSeq).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    var matched = 0
    for ((id, uid, ts) <- ev) {
      val next = clicks.getOrElse(uid, Seq.empty).find(_.getTime > ts.getTime)
      (out(id), next) match {
        case (Some(got), Some(want)) =>
          assert(got.startsWith(fmt.format(want)), s"event $id: $got vs $want"); matched += 1
        case (None, None) => ()
        case other => fail(s"event $id mismatch: $other")
      }
    }
    assert(matched > 0)
  }

  test("tolerance nulls exactly the matches staler than the bound, in both formulations") {
    val dir = "/root/testdata/sf0.001"
    val loose = AsofJoin.asofLastClickNative(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    for (native <- Seq(true, false)) {
      val ev = Tables(spark, dir, "events")
      val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
        .select("user_id", "ts", "value")
      val tight = AsofJoin.asofLastPriorWithin(
        ev.select("event_id", "user_id", "ts"), clicks,
        key = "user_id", time = "ts",
        tolMicros = AsofJoin.ClickTolMicros, native = native)
      val evTs = ev.select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).getTime * 1000).toMap
      val rows = tight.collect().map { r =>
        val id = r.getLong(0)
        val m = Option(r.getAs[java.sql.Timestamp]("asof_ts")).map(_.getTime * 1000)
        (id, m)
      }
      var nulled = 0
      for ((id, m) <- rows) m match {
        case Some(mt) => assert(evTs(id) - mt <= AsofJoin.ClickTolMicros, s"stale match kept for $id")
        case None => if (loose(id).isDefined) nulled += 1
      }
      assert(nulled > 0, s"tolerance never fired (native=$native) — bound untested")
    }
  }
}
