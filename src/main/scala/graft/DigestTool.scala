package graft

import org.apache.spark.sql.SparkSession

/** Prints the PlanShapeSpec digest line for the named queries without
  * running the whole record sweep — same session shape the spec pins
  * under (local[4], shuffle=4, sf0.001). Usage:
  * `runMain graft.DigestTool name [name ...]`.
  */
object DigestTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      def count(p: String) = p.r.findAllIn(plan).length
      println(s"""    "$name" -> (${count("CartesianProduct")}, """ +
        s"""${count("BroadcastNestedLoopJoin")}, ${count("SortMergeJoin")}, """ +
        s"""${count("Sort \\[[^\\]]*\\], true")}, """ +
        s"""${count("Exchange") - count("BroadcastExchange") - count("ReusedExchange")}, """ +
        s"""${count("Window")}),""")
    }
    spark.stop()
  }
}
