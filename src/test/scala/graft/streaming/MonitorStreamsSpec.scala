package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.ops.{TableChecks, Tables, TimeSeries}

case class MonitorEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class MonitorStreamsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus(): Array[MonitorEvent] =
    Tables(spark, dir, "events").collect()
      .map(r => MonitorEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))

  test("streamed CUSUM alarms against the frozen baseline equal the batch query") {
    val base = java.nio.file.Files.createTempDirectory("cusum_base").toString
    val state = java.nio.file.Files.createTempDirectory("cusum_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cusum_ckpt").toString
    val evs = corpus()
    // freeze the baseline from history (the batch query derives its own
    // from the same corpus's first week — identical moments)
    MonitorStreams.writeBaseline(evs.toSeq.toDF(), base)
    val input = MemoryStream[MonitorEvent](spark)
    val q = MonitorStreams.maintainVolume(input.toDF(), state, ckpt)
    for (c <- evs.grouped((evs.length + 2) / 3)) {
      input.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = MonitorStreams.currentAlarms(spark, state, base)
      .collect().map(_.toSeq).toSet
    val want = TimeSeries.cusumChangepoints(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "batch alarm set empty — monitor untestable")
    assert(got == want, s"streamed alarms diverged:\n$got\nvs\n$want")
  }

  test("replayed fold is idempotent; alarms only ever ADD as days complete") {
    val base = java.nio.file.Files.createTempDirectory("cusum_base2").toString
    val state = java.nio.file.Files.createTempDirectory("cusum_state2").toString
    val evs = corpus().sortBy(_.ts.getTime) // stream in event-time order
    MonitorStreams.writeBaseline(evs.toSeq.toDF(), base)
    val (b0, b1) = evs.splitAt(evs.length / 2)
    MonitorStreams.foldBatch(b0.toSeq.toDF(), 0, state)
    val mid = MonitorStreams.currentAlarms(spark, state, base)
      .collect().map(_.toSeq).toSet
    MonitorStreams.foldBatch(b1.toSeq.toDF(), 1, state)
    val first = MonitorStreams.currentAlarms(spark, state, base)
      .collect().map(_.toSeq).toSet
    MonitorStreams.foldBatch(b1.toSeq.toDF(), 1, state) // replay
    val second = MonitorStreams.currentAlarms(spark, state, base)
      .collect().map(_.toSeq).toSet
    assert(first == second, "replay changed the alarm readout")
    // monotonicity on completed days: every alarm whose day closed before
    // the mid-stream cut must persist in the full readout (the CUSUM
    // statistic of a FIXED prefix never changes once its days are final)
    val lastMidDay = new java.sql.Date(b0.last.ts.getTime).toString
    val settled = mid.filter(r => r(1).asInstanceOf[String] < lastMidDay)
    assert(settled.subsetOf(first),
      "a settled alarm vanished after more data arrived")
    // state is calendar-bounded: |types| x |days|, not stream-sized
    val stateRows = spark.read.parquet(s"$state/version=1").count()
    val bound = Tables(spark, dir, "events").select(col("event_type")).distinct().count() *
      Tables(spark, dir, "events").select(org.apache.spark.sql.functions
        .to_date(col("ts"))).distinct().count()
    assert(stateRows <= bound, "state exceeded the calendar bound")
  }

  test("streamed Pareto frontier equals the batch skyline day/price set") {
    import org.apache.spark.sql.functions.to_date
    val state = java.nio.file.Files.createTempDirectory("sky_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sky_ckpt").toString
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2)))
    val input = MemoryStream[(Long, Double, Timestamp)](spark)
    val q = MonitorStreams.maintainFrontier(
      input.toDF().toDF("o_orderkey", "o_totalprice", "o_orderdate"),
      state, ckpt)
    for (c <- orders.grouped((orders.length + 2) / 3)) {
      input.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = MonitorStreams.currentFrontier(spark, state)
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1))).toSet
    val want = graft.ops.Analytics.skylineOrders(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(want.nonEmpty && got == want,
      s"streamed frontier diverged:\n$got\nvs\n$want")
    // state bound: one row per calendar day, never per order
    val stateRows = spark.read.parquet(
      s"$state/version=${new java.io.File(state).listFiles()
        .map(_.getName.stripPrefix("version=").toLong).max}").count()
    val days = Tables(spark, dir, "orders")
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(stateRows == days, "state must be exactly the per-day minima")
  }

  test("streamed integrity monitor: clean ingest certifies empty; damaged ingest equals the batch audit") {
    import org.apache.spark.sql.functions.{expr, floor, when}
    val orders = Tables(spark, dir, "orders")
    def collectRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("timestamp"),
        col("o_orderpriority")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3), r.getTimestamp(4), r.getString(5)))
    def stream(rows: Array[(Long, Long, String, Double, Timestamp, String)],
        state: String, ckpt: String): Unit = {
      val input = MemoryStream[(Long, Long, String, Double, Timestamp, String)](spark)
      val q = MonitorStreams.maintainIntegrity(
        input.toDF().toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority"), state, ckpt)
      for (c <- rows.grouped(math.max(1, (rows.length + 2) / 3))) {
        input.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    // clean ingest: the live checksums certify the full corpus
    val s1 = java.nio.file.Files.createTempDirectory("int_state1").toString
    val c1 = java.nio.file.Files.createTempDirectory("int_ckpt1").toString
    stream(collectRows(orders), s1, c1)
    assert(MonitorStreams.currentIntegrityDiff(spark, s1, orders).count() == 0L,
      "clean ingest must certify bucket-for-bucket")
    // damaged ingest (the replicaBucketDiff plants): the live diff equals
    // the batch audit's flagged buckets exactly
    val damaged = orders
      .filter(col("o_orderkey") % 1499 =!= 1)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 997 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val s2 = java.nio.file.Files.createTempDirectory("int_state2").toString
    val c2 = java.nio.file.Files.createTempDirectory("int_ckpt2").toString
    stream(collectRows(damaged), s2, c2)
    val got = MonitorStreams.currentIntegrityDiff(spark, s2, orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = TableChecks.replicaBucketDiff(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want,
      s"live integrity diff diverged from the batch audit:\n$got\nvs\n$want")
  }
}
