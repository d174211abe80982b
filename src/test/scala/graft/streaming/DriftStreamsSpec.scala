package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.ops.{TableChecks, Tables}

case class DriftEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class DriftStreamsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val splitTs = Timestamp.valueOf(s"${TableChecks.PsiSplitDate} 00:00:00")

  private def corpus(): Array[DriftEvent] =
    Tables(spark, dir, "events").collect()
      .map(r => DriftEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))

  test("streamed PSI against the frozen baseline equals the batch psi_drift") {
    val base = java.nio.file.Files.createTempDirectory("psi_base").toString
    val state = java.nio.file.Files.createTempDirectory("psi_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("psi_ckpt").toString
    val evs = corpus()
    val (pre, post) = evs.partition(_.ts.before(splitTs))
    // freeze the pre-period histogram, then stream the post period
    DriftStreams.writeBaseline(pre.toSeq.toDF(), base)
    val input = MemoryStream[DriftEvent](spark)
    val q = DriftStreams.maintainDrift(input.toDF(), state, ckpt)
    for (c <- post.grouped((post.length + 2) / 3)) {
      input.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = DriftStreams.currentPsi(spark, state, base)
      .collect().map(_.toSeq).toSet
    // the batch query computes pre-vs-post over the SAME corpus — the
    // streamed monitor must reproduce it exactly, not approximately
    val want = TableChecks.psiDrift(spark, dir).collect().map(_.toSeq).toSet
    assert(got == want, s"streamed PSI diverged:\n$got\nvs\n$want")
  }

  test("replayed fold is idempotent; mid-stream PSI is served per version") {
    val base = java.nio.file.Files.createTempDirectory("psi_base2").toString
    val state = java.nio.file.Files.createTempDirectory("psi_state2").toString
    val evs = corpus()
    val (pre, post) = evs.partition(_.ts.before(splitTs))
    DriftStreams.writeBaseline(pre.toSeq.toDF(), base)
    val (b0, b1) = post.splitAt(post.length / 2)
    DriftStreams.foldBatch(b0.toSeq.toDF(), 0, state)
    val mid = DriftStreams.currentPsi(spark, state, base).collect().map(_.toSeq).toSet
    assert(mid.nonEmpty)
    DriftStreams.foldBatch(b1.toSeq.toDF(), 1, state)
    val first = DriftStreams.currentPsi(spark, state, base).collect().map(_.toSeq).toSet
    DriftStreams.foldBatch(b1.toSeq.toDF(), 1, state)
    val second = DriftStreams.currentPsi(spark, state, base).collect().map(_.toSeq).toSet
    assert(first == second, "replay changed the drift readout")
    // live counts actually grew between versions
    val rows = spark.read.parquet(s"$state/version=1")
      .agg(org.apache.spark.sql.functions.sum(col("c"))).head().getLong(0)
    // each event lands in one bucket per monitored column
    assert(rows == 2L * (b0.length + b1.length),
      "state must hold exactly the streamed rows, once per column")
  }
}
