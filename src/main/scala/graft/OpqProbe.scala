package graft
import org.apache.spark.sql.SparkSession
import graft.ops.Similarity
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqAdcTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val opq = Similarity.opqTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val resid = Similarity.ivfPqResidualTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val chain = Similarity.opqIvfPqTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PQ_RECALL=${(brute & pq).size.toDouble / brute.size}")
    println(s"OPQ_RECALL=${(brute & opq).size.toDouble / brute.size}")
    println(s"IVFPQ_RESID_RECALL=${(brute & resid).size.toDouble / brute.size}")
    println(s"OPQ_IVF_PQ_RECALL=${(brute & chain).size.toDouble / brute.size}")
    spark.stop()
  }
}
