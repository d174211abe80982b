package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality diagnostic: prints join strategy / shuffle / pushdown shape
  * for the headline queries. Usage: `runMain graft.PlanAudit [sfDir]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // nanos-era events.ts
      .config("spark.sql.session.timeZone", "UTC") // NTZ-era events.ts cast
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val audited = Seq("tpch_q5", "tpch_q3", "tpch_q1", "top_customers",
      "filter_incomplete", "events_sessions", "events_sessions_sw",
      "dedup_exact_keep_first", "asof_last_click", "minhash_lsh_pairs",
      "decontaminate", "repetition_stats", "pack_sequences", "pii_scrub",
      "bm25_topk", "opq_topk", "ivf_pq_residual_rerank_topk")
    for (name <- audited) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def count(p: String) = p.r.findAllIn(plan).length
      // shuffles only: subtract broadcast + reused exchanges from the total
      val shuffles = count("Exchange") - count("BroadcastExchange") - count("ReusedExchange")
      println(s"== $name: broadcastJoins=${count("BroadcastHashJoin")} " +
        s"sortmerge=${count("SortMergeJoin")} shuffles=$shuffles " +
        s"pushedFilters=${if (plan.contains("PushedFilters: [")) "yes" else "no"}")
    }
    println(SparkEntry.queries("tpch_q5")(spark, dir).queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
