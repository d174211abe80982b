package graft
import org.apache.spark.sql.SparkSession
import graft.ops.Similarity
object ResRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Similarity.ivfPqTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val res = Similarity.ivfPqResidualTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"RAW_RECALL=${(brute & raw).size.toDouble / brute.size}")
    println(s"RES_RECALL=${(brute & res).size.toDouble / brute.size}")
    spark.stop()
  }
}
