package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

/** State-store hygiene probe: every stateful twin in this suite runs on
  * the default HDFS-backed state store; at 100 TB the store of record is
  * RocksDB (bounded executor memory, changelog checkpointing). This spec
  * pins that the HEAVIEST stateful twin — the watermark-bounded
  * stream-stream LEFT OUTER join, which keeps BOTH sides' state alive to
  * the horizon — produces the identical result under
  * `RocksDBStateStoreProvider`, i.e. nothing in the operator depends on
  * provider-specific state semantics. The conf is read at query start,
  * so the flip is scoped to this suite (sbt forks tests into one
  * sequential JVM).
  */
class RocksDbStateSpec extends SparkSuite {
  import spark.implicits._

  private def t(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runAttribution(queryName: String): Set[(Long, Timestamp,
      Option[Timestamp], Double, Option[Double])] = {
    val clicks = MemoryStream[TestEvent](spark)
    val purchases = MemoryStream[TestEvent](spark)
    clicks.addData(TestEvent(t(10), 1, "click", 1.0))
    purchases.addData(
      TestEvent(t(60), 1, "purchase", 50.0),  // matched promptly
      TestEvent(t(60), 2, "purchase", 70.0))  // click-less → watermark-delayed
    val q = EventStreams.clickPurchaseAttributionOuter(
      clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // advance both watermarks past the horizon so the null-padded row emits
    clicks.addData(TestEvent(t(300), 9, "click", 0.0))
    purchases.addData(TestEvent(t(300), 9, "purchase", 0.0))
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    // witness that the intended provider actually served the join state
    val metrics = progress.stateOperators.flatMap(
      _.customMetrics.keySet().toArray.map(_.toString)).toSet
    if (spark.conf.getOption(ProviderConf).contains(RocksDb))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"RocksDB provider configured but no rocksdb state metrics: $metrics")
    else
      assert(!metrics.exists(_.toLowerCase.contains("rocksdb")),
        "default provider run unexpectedly reported rocksdb metrics")
    spark.table(queryName)
      .filter(org.apache.spark.sql.functions.col("purchase_ts") === t(60))
      .select("user_id", "purchase_ts", "click_ts", "purchase_value", "click_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet
  }

  test("stream-stream outer join state survives the RocksDB provider swap") {
    val expected = Set(
      (1L, t(60), Some(t(10)), 50.0, Some(1.0)),
      (2L, t(60), None, 70.0, None))
    val hdfsBacked = runAttribution("attr_state_default")
    assert(hdfsBacked == expected, s"default store: $hdfsBacked")
    spark.conf.set(ProviderConf, RocksDb)
    try {
      val rocks = runAttribution("attr_state_rocksdb")
      assert(rocks == expected, s"rocksdb store: $rocks")
    } finally spark.conf.unset(ProviderConf)
  }
}
