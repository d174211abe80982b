package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("tpch_q5", "tpch_q3", "tpch_q1", "top_customers", "filter_incomplete", "events_sessions", "dedup_exact_keep_first")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def count(p: String) = p.r.findAllIn(plan).length
      println(s"== $name: broadcasts=${count("BroadcastHashJoin")} sortmerge=${count("SortMergeJoin")} " +
        s"exchanges=${count("Exchange")} wholestage=${count("WholeStageCodegen")} " +
        s"pushedFilters=${if (plan.contains("PushedFilters: [")) "yes" else "no"}")
    }
    // detailed look at the flagship + the doc filter scan
    println(SparkEntry.queries("tpch_q5")(spark, dir).queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
