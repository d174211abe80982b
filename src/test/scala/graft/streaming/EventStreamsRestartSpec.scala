package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

import graft.SparkSuite

case class RestartEvent(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** File-source checkpoint/restart for the EVENT side (the corpus-ingest
  * twin is [[DocStreamsRestartSpec]]): a watermarked tumbling aggregate
  * over a real file source and file sink, killed between batches and
  * restarted. Properties the MemoryStream specs cannot exercise:
  *
  *  - watermark + window state recovery: a window whose events all arrived
  *    BEFORE the kill must still finalize and emit AFTER the restart, once
  *    post-restart data advances the recovered watermark past its end — if
  *    state were lost, those events would never be emitted at all (the
  *    post-restart batches contain no rows for that window);
  *  - exactly-once output: the file sink's commit log admits each finalized
  *    window once across the kill — nothing replayed, nothing dropped;
  *  - idle recovery: restarting with no new input emits nothing.
  */
class EventStreamsRestartSpec extends SparkSuite {
  import spark.implicits._

  private def t(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("tumbling aggregate state and sink log survive a kill/restart") {
    val root = Files.createTempDirectory("graft-ev-restart").toFile
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(in).mkdirs()

    def startQuery() =
      EventStreams.tumbling(
          spark.readStream.schema(schema).parquet(in), watermark = "30 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()

    // --- run 1, batch A: two typeX events in [00:00, 01:00), one typeY in
    // [01:00, 02:00). Watermark after A = 01:10 − 30m = 00:40 → nothing
    // finalizes yet.
    Seq(
      RestartEvent(1, t(0, 10), "typeX", 1.5),
      RestartEvent(2, t(0, 20), "typeX", 2.5),
      RestartEvent(3, t(1, 10), "typeY", 4.0))
      .toDF().write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    // batch B: one typeZ event at 02:00 pushes the watermark to 01:30 →
    // the [00:00, 01:00) typeX window finalizes and emits BEFORE the kill
    Seq(RestartEvent(4, t(2, 0), "typeZ", 8.0))
      .toDF().write.mode("append").parquet(in)
    q1.processAllAvailable()
    q1.stop() // the "kill": query dies, checkpoint stays

    val afterRun1 = spark.read.parquet(out)
      .select("window_start", "event_type", "n", "value_sum").collect()
    assert(afterRun1.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet ==
      Set((t(0, 0), "typeX", 2L)),
      s"pre-kill output should be exactly the finalized typeX window, got ${afterRun1.mkString(", ")}")

    // --- run 2: an event at 03:00 advances the RECOVERED watermark to
    // 02:30, which must finalize [01:00, 02:00) — whose only event (typeY)
    // arrived entirely before the kill
    Seq(RestartEvent(5, t(3, 0), "typeZ", 16.0))
      .toDF().write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out)
      .select("window_start", "event_type", "n", "value_sum").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == rows.distinct.length,
      s"output not exactly-once: ${rows.mkString(", ")}")
    assert(rows.toSet == Set(
      (t(0, 0), "typeX", 2L, 4.0),
      (t(1, 0), "typeY", 1L, 4.0)),
      s"expected the two finalized windows exactly once, got ${rows.mkString(", ")}")

    // --- run 3: restart with NO new input — recovery alone must not
    // re-emit or re-finalize anything
    val q3 = startQuery()
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(out).count() == 2, "idle restart re-emitted rows")
  }
}
