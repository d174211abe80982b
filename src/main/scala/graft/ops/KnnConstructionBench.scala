package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the k-NN-graph CONSTRUCTION cost vs quantizer cell
  * count (the Σ|cell|² init contract, measured rather than argued): times
  * `fitCentroids` + `knnGraphEdges` — the eager localCheckpoint supersteps,
  * i.e. exactly the build phase, no beam search — for each requested cell
  * count, several samples each.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ops.KnnConstructionBench [cells,cells,...]"` (default 16,64,128).
  * Prints one JSON line per cell count with all samples and the min (the
  * statistic BASELINE.md's protocol compares on this noisy VM).
  */
object KnnConstructionBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cellCounts =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
      else Seq(16, 64, 128)
    val samples = sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .localCheckpoint(true) // exclude the source scan from every sample
    for (n <- cellCounts) {
      val times = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        val cent = Similarity.fitCentroids(spark, dir, n)
        val edges = GraphAnn.knnGraphEdges(e, cent) // eager supersteps
        val rows = edges.count()
        val sec = (System.nanoTime() - t0) / 1e9
        edges.unpersist()
        (sec, rows)
      }
      val secs = times.map(_._1)
      println(f"""{"cells":$n,"construction_sec_min":${secs.min}%.3f,""" +
        f""""samples":[${secs.map(s => f"$s%.3f").mkString(",")}],""" +
        s""""edge_rows":${times.head._2}}""")
    }
    spark.stop()
  }
}
