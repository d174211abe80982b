package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/parquet-footer cold-start otherwise lands
    // entirely on whichever query happens to run first.
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // Min of two runs per query: this environment shows 2-4× multi-thread
    // scheduling noise run-to-run (single-thread perf is stable), so a
    // single sample measures the scheduler, not the plan. The first run also
    // absorbs that plan's codegen compile. clearCache between runs keeps the
    // second run honest for queries that persist an index table internally
    // (otherwise run 2 would time a CacheManager hit, not the plan).
    // A throwing query is reported as -1, never as its time-to-throw.
    // Local-iteration aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset.
    // The driver sets only SPARK_GRAFT_SF_DIR/CPUS → full sweep.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    only.foreach(_.diff(SparkEntry.benchQueries.toSet).foreach(n =>
      System.err.println(s"[bench] WARNING: '$n' matches no bench query — typo?")))
    val results = SparkEntry.benchQueries
      .filter(name => only.forall(_.contains(name)))
      .map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
