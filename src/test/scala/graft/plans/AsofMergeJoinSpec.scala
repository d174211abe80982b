package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native as-of operator (custom LogicalPlan → SparkStrategy →
  * SparkPlan): semantics pinned against the compositional window
  * formulation, and the physical contract (merge-join plan shape, declared
  * output partitioning/ordering reused downstream) pinned against the
  * executed plan.
  */
class AsofMergeJoinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("native as-of equals the union+window composition on events") {
    val native = graft.ops.AsofJoin.asofLastClickNative(spark, dir).collect()
    val window = graft.ops.AsofJoin.asofLastClick(spark, dir).collect()
    assert(native.length == window.length)
    assert(native.sameElements(window))
  }

  test("plans as AsofMergeJoin with one exchange+sort per side") {
    val ev = graft.ops.Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val df = AsofMergeJoin.asofLastPrior(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      clicks, key = "user_id", time = "ts")
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofMergeJoin"), s"native operator not planned:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly one hash exchange per side:\n$plan")
  }

  test("strictness, null keys, null times, and latest-prior selection") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    val lSchema = T.StructType(Seq(
      T.StructField("k", T.StringType), T.StructField("t", T.LongType),
      T.StructField("tag", T.StringType)))
    val rSchema = T.StructType(Seq(
      T.StructField("k", T.StringType), T.StructField("t", T.LongType),
      T.StructField("v", T.StringType)))
    val left = spark.createDataFrame(Seq(
      Row("a", 5L, "before_any"),     // no right row < 5 for key a? r@(a,5) equal → strict, no match
      Row("a", 10L, "after_two"),     // r@(a,5),(a,7) → latest prior is (a,7)
      Row("b", 1L, "none"),           // right has no key b rows before 1
      Row(null, 10L, "null_key"),     // null key never matches
      Row("c", null, "null_time"),    // null time → no strict-prior row
      Row("d", 9L, "skip_null_rt")    // right (d, null, x) must not match
    ).asJava, lSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", 5L, "a5"), Row("a", 7L, "a7"), Row("a", 10L, "a10"),
      Row("b", 2L, "b2"), Row(null, 1L, "nullk"), Row("d", null, "dnull")
    ).asJava, rSchema)
    val out = AsofMergeJoin.asofLastPrior(left, right, key = "k", time = "t")
      .select("tag", "asof_v", "asof_t")
      .collect().map(r => r.getString(0) -> (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(out("before_any") == ((null, -1L)))   // equal-time right row excluded
    assert(out("after_two") == (("a7", 7L)))     // latest strictly-prior wins
    assert(out("none") == ((null, -1L)))
    assert(out("null_key") == ((null, -1L)))
    assert(out("null_time") == ((null, -1L)))
    assert(out("skip_null_rt") == ((null, -1L)))
  }

  test("non-nullable right columns null out correctly on unmatched left rows") {
    import spark.implicits._
    // count() from a groupBy is non-nullable in the right child's schema; an
    // output projection bound to that nullability would read 0 instead of
    // NULL for left rows with no prior right row
    val left = Seq(("a", 10L), ("b", 10L)).toDF("k", "t")
    val right = Seq(("a", 1L), ("a", 2L)).toDF("k", "rt")
      .groupBy("k").agg(max(col("rt")).as("t"), count(lit(1)).as("n"))
    val out = AsofMergeJoin.asofLastPrior(left, right, key = "k", time = "t")
      .select("k", "asof_n").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out("a") == Some(2L))
    assert(out("b") == None,
      "unmatched left row must surface NULL for a non-nullable right column, not 0")
  }

  test("prefixed right names colliding with left columns are rejected upfront") {
    import spark.implicits._
    val left = Seq(("a", 1L, "x")).toDF("k", "t", "asof_v")
    val right = Seq(("a", 0L, "y")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsofMergeJoin.asofLastPrior(left, right, key = "k", time = "t")
    }
    assert(e.getMessage.contains("asof_v"))
  }

  test("declared partitioning+ordering feed a downstream window without re-exchange or re-sort") {
    val ev = graft.ops.Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = AsofMergeJoin.asofLastPrior(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      clicks, key = "user_id", time = "ts")
    val w = Window.partitionBy("user_id").orderBy("ts")
    val df = joined.withColumn("rn", row_number().over(w))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the window's required (hash(user_id), sort user_id+ts) must be proven
    // satisfied by AsofMergeJoinExec's outputPartitioning/outputOrdering:
    // exactly the join's own two exchanges, and only the join's two sorts
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"window added an exchange — outputPartitioning not honored:\n$plan")
    assert("\\bSort\\b".r.findAllIn(plan).size == 2,
      s"window added a sort — outputOrdering not honored:\n$plan")
  }

  test("pre-bucketed sorted layout: the native as-of plans with zero exchanges") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_asof_buckets").toFile
    val ev = graft.ops.Tables(spark, dir, "events")
    try {
      // one file per bucket so the scan reports both the hash partitioning
      // and the (user_id, ts) sort — the layout a production events table
      // would carry precisely to make every per-user merge free
      ev.select(col("event_id"), col("user_id"), col("ts")).repartition(1)
        .write.mode("overwrite").option("path", s"$tmp/ev")
        .bucketBy(4, "user_id").sortBy("user_id", "ts").saveAsTable("asof_ev_b")
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value")).repartition(1)
        .write.mode("overwrite").option("path", s"$tmp/cl")
        .bucketBy(4, "user_id").sortBy("user_id", "ts").saveAsTable("asof_cl_b")
      val df = AsofMergeJoin.asofLastPrior(
        spark.table("asof_ev_b"), spark.table("asof_cl_b"),
        key = "user_id", time = "ts")
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsofMergeJoin"), s"native operator not planned:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed as-of still shuffles — required distribution not matched to the layout:\n$plan")
      // and the result is still the as-of result
      val viaLayout = df.select("event_id", "asof_value").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val direct = AsofMergeJoin.asofLastPrior(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value")),
        key = "user_id", time = "ts")
        .select("event_id", "asof_value").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(viaLayout == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_ev_b")
      spark.sql("DROP TABLE IF EXISTS asof_cl_b")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }
}
