package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.SparkSuite

/** The checkpoint/restart path of the streaming ingest: a real file source
  * and file sink with a checkpoint directory, killed between batches and
  * restarted. Two properties a production ingest job depends on, neither of
  * which the MemoryStream specs exercise:
  *
  *  - state recovery: the dedup digest state survives the restart — a
  *    post-restart document whose scrubbed content duplicates a
  *    PRE-restart document is still dropped (if state were lost it would
  *    be emitted, since its own micro-batch has no competing row);
  *  - exactly-once output: the file sink's commit log admits each batch
  *    once, so re-reading the output directory after the restart yields
  *    every surviving document exactly once — nothing replayed, nothing
  *    dropped.
  */
class DocStreamsRestartSpec extends SparkSuite {
  import spark.implicits._

  private def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  test("dedup state and sink log survive a kill/restart (exactly-once output)") {
    val root = Files.createTempDirectory("graft-restart").toFile
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(in).mkdirs()

    def startQuery() =
      DocStreams.cleanedDocs(
          spark.readStream.schema(schema).parquet(in), watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()

    // --- run 1: three docs, one in-batch duplicate (modulo leaked PII) ---
    Seq(
      TestDoc(1, t(1), "the quick brown fox writes to alice@example.com daily"),
      TestDoc(2, t(2), "the quick brown fox writes to bob@corp.example.org daily"),
      TestDoc(3, t(3), "a completely different document about sequence packing"))
      .toDF().write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // the "kill": the JVM-side query dies, checkpoint stays

    // --- run 2: doc 4 duplicates doc 1 ACROSS the restart; doc 5 is new ---
    Seq(
      TestDoc(4, t(10), "the quick brown fox writes to carol@other.example.net daily"),
      TestDoc(5, t(11), "fresh post-restart content about watermark recovery"))
      .toDF().write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val result = spark.read.parquet(out).select("doc_id", "text").collect()
    val ids = result.map(_.getLong(0)).toSeq.sorted
    // each survivor EXACTLY once — a replayed batch would duplicate the
    // run-1 output, lost dedup state would admit 4. Which of the in-batch
    // duplicate pair {1, 2} wins is NOT asserted (dropDuplicates keeps an
    // arbitrary row within a batch); that exactly one wins is.
    assert(ids.size == 3 && ids.distinct.size == 3,
      s"output not exactly-once: ${ids.mkString(", ")}")
    assert(ids.count(Set(1L, 2L)) == 1,
      s"in-batch duplicate pair not collapsed to one: ${ids.mkString(", ")}")
    assert(!ids.contains(4L),
      "doc 4 emitted: dedup state was NOT recovered from the checkpoint")
    assert(ids.contains(3L) && ids.contains(5L), s"lost a unique doc: ${ids.mkString(", ")}")
    assert(result.forall(!_.getString(1).contains("@")), "PII survived the scrub")

    // restart a third time with NO new input: recovery alone must not
    // re-emit anything
    val q3 = startQuery()
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(out).count() == 3, "idle restart re-emitted rows")
  }
}
