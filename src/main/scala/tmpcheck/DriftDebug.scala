package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DriftDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.001"
    val seed = Tables(spark, src, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val drifted = spark.read.parquet(s"$src/embeddings.parquet")
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(3.0f) + lit(7.0f)).as("embedding"))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val grown = seed.unionByName(drifted)
    val q = seed.filter(col("vec_id") === 50)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val booksSeed = Similarity.fitPqFrom(seed, Similarity.PqM, Similarity.PqKs)
    val booksGrown = Similarity.fitPqFrom(grown, Similarity.PqM, Similarity.PqKs)
    def show(tag: String, codesSrc: org.apache.spark.sql.DataFrame, books: Array[Array[Array[Double]]]): Unit = {
      val r = Similarity.adcTopKAgainst(Similarity.assignCodes(codesSrc, books, Seq("vec_id")), q, books, 3)
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
      println(s"$tag -> $r")
    }
    show("frozen+seed ", seed, booksSeed)
    show("frozen+grown", grown, booksSeed)
    show("refit+grown ", grown, booksGrown)
    spark.stop()
  }
}
