package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ops.IncrementalAgg

case class TestOrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
    o_orderdate: Timestamp)

class ViewStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def d(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private def order(k: Long, c: Long, p: Double, day: Int) = TestOrder(k, c, p, d(day))

  test("maintained view equals the full recompute after every micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("mv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mv_ckpt").toString
    val input = MemoryStream[TestOrder](spark)
    val q = ViewStreams.maintainCustomerRevenue(input.toDF(), dir, ckpt)
    val all = scala.collection.mutable.ArrayBuffer.empty[TestOrder]

    def checkAgainstRecompute(): Unit = {
      val got = ViewStreams.currentView(spark, dir)
      val want = IncrementalAgg.state(all.toSeq.toDF())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"view diverges from recompute:\n${got.collect().mkString("\n")}\nvs\n${want.collect().mkString("\n")}")
    }

    val b1 = Seq(order(1, 10, 5.0, 1), order(2, 10, 7.5, 2), order(3, 20, 3.0, 1))
    all ++= b1; input.addData(b1: _*); q.processAllAvailable()
    checkAgainstRecompute()

    // second batch touches an existing key and a new one
    val b2 = Seq(order(4, 10, 2.5, 3), order(5, 30, 9.0, 3))
    all ++= b2; input.addData(b2: _*); q.processAllAvailable()
    checkAgainstRecompute()

    // third batch: retention leaves at most two version directories
    val b3 = Seq(order(6, 20, 1.0, 4))
    all ++= b3; input.addData(b3: _*); q.processAllAvailable()
    checkAgainstRecompute()
    q.stop()
    val versions = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
    assert(versions.length <= 2,
      s"retention failed: ${versions.map(_.getName).mkString(",")}")
  }

  test("replayed fold is idempotent: same batch id, same predecessor, same view") {
    val dir = java.nio.file.Files.createTempDirectory("mv_replay").toString
    val b0 = Seq(order(1, 10, 5.0, 1)).toDF()
    val b1 = Seq(order(2, 10, 7.5, 2), order(3, 20, 3.0, 2)).toDF()
    ViewStreams.foldBatch(b0, 0, dir)
    ViewStreams.foldBatch(b1, 1, dir)
    val first = ViewStreams.currentView(spark, dir).collect().toSet
    // the crash window: batch 1 re-executes with the same id — the fold
    // must re-read version=0 (not its own output) and rewrite identically
    ViewStreams.foldBatch(b1, 1, dir)
    val second = ViewStreams.currentView(spark, dir).collect().toSet
    assert(first == second, "replay changed the view")
  }
}
