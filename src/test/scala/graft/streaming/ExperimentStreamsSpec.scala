package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ops.{Experiment, Tables}

case class ExpEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class ExperimentStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(): Array[ExpEvent] =
    Tables(spark, "/root/testdata/sf0.001", "events")
      .collect()
      .map(r => ExpEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))

  test("streamed readout equals the batch CUPED recompute after every fold") {
    val dir = java.nio.file.Files.createTempDirectory("exp_mv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("exp_ckpt").toString
    val evs = corpus()
    val chunks = evs.grouped((evs.length + 2) / 3).toSeq
    val input = MemoryStream[ExpEvent](spark)
    val q = ExperimentStreams.maintainReadout(input.toDF(), dir, ckpt)
    val seen = scala.collection.mutable.ArrayBuffer.empty[ExpEvent]
    for (c <- chunks) {
      seen ++= c; input.addData(c: _*); q.processAllAvailable()
      val got = ExperimentStreams.currentReadout(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      val want = Experiment.abCupedLiftFrom(seen.toSeq.toDF()).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      assert(got == want, s"readout diverged after ${seen.size} events:\n$got\nvs\n$want")
    }
    q.stop()
    // the final streamed readout equals the registered batch query verbatim
    val fin = ExperimentStreams.currentReadout(spark, dir).collect().map(_.toSeq).toSet
    val batch = Experiment.abCupedLift(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(fin == batch)
  }

  test("replayed fold is idempotent on the experiment state") {
    val dir = java.nio.file.Files.createTempDirectory("exp_replay").toString
    val evs = corpus()
    val (b0, b1) = evs.splitAt(evs.length / 2)
    ExperimentStreams.foldBatch(b0.toSeq.toDF(), 0, dir)
    ExperimentStreams.foldBatch(b1.toSeq.toDF(), 1, dir)
    val first = ExperimentStreams.currentReadout(spark, dir).collect().map(_.toSeq).toSet
    ExperimentStreams.foldBatch(b1.toSeq.toDF(), 1, dir)
    val second = ExperimentStreams.currentReadout(spark, dir).collect().map(_.toSeq).toSet
    assert(first == second, "replay changed the readout")
  }
}
