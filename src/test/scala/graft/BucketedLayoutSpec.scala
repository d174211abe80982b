package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Executable proof of the SURVEY "Deploying at 100 TB" storage-layout
  * claim: facts written bucketed on their join key hash-join WITHOUT any
  * exchange — the shuffle that normally dominates a fact-fact join at
  * scale is paid once at write time and amortized over every subsequent
  * join and aggregation on that key.
  */
class BucketedLayoutSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed-by-join-key fact tables join and aggregate with zero exchanges") {
    val tmp = Files.createTempDirectory("graft_buckets").toFile
    val li = ops.Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = ops.Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    try {
      li.write.mode("overwrite").option("path", s"$tmp/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
      ord.write.mode("overwrite").option("path", s"$tmp/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
      // disable broadcast so the join would otherwise be exchange+SMJ —
      // the realistic two-big-facts case this layout exists for
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("li_bucketed")
          .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey")
          .agg(sum("l_quantity").as("qty"), first("o_totalprice").as("total"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles — layout not picked up:\n$plan")
        assert(j.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(): Unit
      }
      rm(tmp)
    }
  }
}
