package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Join-strategy control — the third leg of the engine's join toolkit
  * next to broadcast (`broadcast()` everywhere a dim fits) and bucketing
  * (shuffle-free SMJ, BucketedLayoutSpec).
  *
  * Spark's planner defaults fact⋈fact to SortMergeJoin. When one side's
  * PER-PARTITION footprint fits executor memory, ShuffledHashJoin wins:
  * it skips the big side's sort entirely (build a hash table on the small
  * side, stream the large side). The `SHUFFLE_HASH` hint is the
  * declarative knob; this spec pins that the hint actually flips the
  * physical operator, that neither side re-sorts, and that results are
  * identical — strategy choice is layout-only, never semantic.
  *
  * 100-TB guidance encoded here: prefer broadcast < shuffled-hash < SMJ
  * as the small side grows; SHJ's risk is build-side OOM on a skewed
  * partition (SMJ spills gracefully), which is why it is an explicit
  * opt-in hint, not a blanket conf flip.
  */
class JoinStrategySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def sides = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val items = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    (orders, items)
  }

  test("SHUFFLE_HASH hint flips SMJ to ShuffledHashJoin and drops the sorts") {
    val s = spark.newSession()
    // forbid broadcast so the strategy contest is SMJ vs SHJ
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val orders = graft.ops.Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val items = graft.ops.Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    val smj = items.join(orders, "o_orderkey")
    val smjPlan = smj.queryExecution.executedPlan.toString
    assert(smjPlan.contains("SortMergeJoin"), s"default should be SMJ:\n$smjPlan")

    val shj = items.join(orders.hint("SHUFFLE_HASH"), "o_orderkey")
    val shjPlan = shj.queryExecution.executedPlan.toString
    assert(shjPlan.contains("ShuffledHashJoin"), s"hint ignored:\n$shjPlan")
    assert(!shjPlan.contains("SortMergeJoin"))
    // the whole point: the corpus-sized side is never sorted
    assert(!"Sort \\[".r.findFirstIn(shjPlan).isDefined,
      s"SHJ must not sort either side:\n$shjPlan")
  }

  test("strategy choice is layout-only: SHJ and SMJ aggregate identically") {
    val (orders, items) = sides
    def agg(joined: org.apache.spark.sql.DataFrame) =
      joined.groupBy("o_custkey")
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
        .orderBy("o_custkey").collect().toSeq
    val viaShj = agg(items.join(orders.hint("SHUFFLE_HASH"), "o_orderkey"))
    val viaSmj = agg(items.join(orders.hint("MERGE"), "o_orderkey"))
    assert(viaShj == viaSmj)
    assert(viaShj.nonEmpty)
  }
}
