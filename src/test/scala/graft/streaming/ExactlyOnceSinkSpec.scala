package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

import graft.SparkSuite

case class SinkEvent(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Exactly-once contract of [[Sinks.exactlyOnceParquet]] under batch
  * REPLAY — the failure mode [[EventStreamsRestartSpec]] cannot reach.
  *
  * A clean `stop()`+restart never replays: the commit log says every
  * executed batch finished, so restart resumes at the next offset. The
  * at-least-once crash window is "sink write completed, commit marker
  * lost" — simulated here by deleting `checkpoint/commits/N` for the last
  * batch after stopping. On restart Spark finds offsets/N without
  * commits/N and RE-EXECUTES batch N through `foreachBatch` with the same
  * batchId and input slice. An appending sink duplicates that batch's rows;
  * the deterministic `batch_id=N` overwrite must not.
  */
class ExactlyOnceSinkSpec extends SparkSuite {
  import spark.implicits._

  private def t(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def latestCommit(ckpt: String): java.nio.file.Path = {
    val commits = Paths.get(ckpt, "commits")
    import scala.jdk.CollectionConverters._
    Files.list(commits).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
  }

  test("replayed foreachBatch batch overwrites instead of duplicating") {
    val root = Files.createTempDirectory("graft-eo-sink").toFile
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(in).mkdirs()

    // the stream under the sink: watermarked exact dedup (stateful, so the
    // replay also exercises state-version recovery, not just the sink)
    def startQuery() =
      Sinks.exactlyOnceParquet(
        EventStreams.dedupEvents(
          spark.readStream.schema(schema).parquet(in), watermark = "30 minutes"),
        out, ckpt)

    // batch A: three events, one an at-least-once duplicate of event 1
    Seq(
      SinkEvent(1, t(0, 10), "typeX", 1.5),
      SinkEvent(1, t(0, 10), "typeX", 1.5),
      SinkEvent(2, t(0, 20), "typeY", 2.5))
      .toDF().write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    val afterRun1 = Sinks.readSink(spark, out)
      .select("event_id", "event_type").as[(Long, String)].collect().sorted
    assert(afterRun1.toSeq == Seq((1L, "typeX"), (2L, "typeY")),
      s"run 1 should emit the deduped batch, got ${afterRun1.mkString(", ")}")

    // the crash window: batch N's sink write landed, its commit marker did
    // not. Restart must re-execute batch N through foreachBatch.
    val lost = latestCommit(ckpt)
    val lostBatch = lost.getFileName.toString.toLong
    Files.delete(lost)
    // the local ChecksumFs shadows every file with .N.crc; leaving it
    // behind blocks the re-commit's rename
    Files.deleteIfExists(lost.resolveSibling(s".$lostBatch.crc"))

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    assert(Files.exists(Paths.get(ckpt, "commits", lostBatch.toString)),
      "restart did not re-commit the replayed batch")

    val afterReplay = Sinks.readSink(spark, out)
      .select("event_id", "event_type").as[(Long, String)].collect().sorted
    assert(afterReplay.length == afterReplay.distinct.length,
      s"replay duplicated sink rows: ${afterReplay.mkString(", ")}")
    assert(afterReplay.toSeq == Seq((1L, "typeX"), (2L, "typeY")),
      s"post-replay output should be unchanged, got ${afterReplay.mkString(", ")}")

    // life goes on: a later batch lands in its own batch_id dir alongside
    // the replayed one, and the union stays duplicate-free
    Seq(SinkEvent(3, t(0, 40), "typeZ", 8.0))
      .toDF().write.mode("append").parquet(in)
    val q3 = startQuery()
    q3.processAllAvailable()
    q3.stop()

    val finalRows = Sinks.readSink(spark, out)
      .select("event_id", "event_type").as[(Long, String)].collect().sorted
    assert(finalRows.toSeq == Seq((1L, "typeX"), (2L, "typeY"), (3L, "typeZ")),
      s"expected three unique events across batches, got ${finalRows.mkString(", ")}")
  }
}
