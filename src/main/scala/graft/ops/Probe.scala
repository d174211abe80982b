package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level timing probe for the optimization round — NOT
  * registered, deleted before the round closes. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.headOption.getOrElse("knn") match {
      case "knn" =>
        val e = Tables(spark, dir, "embeddings")
          .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        println("[probe] emb rows: " + e.count())
        val cent = t("fitCentroids")(Similarity.fitCentroids(spark, dir, Similarity.NCentroids))
        val (reps, members) = GraphAnn.repsOf(e)
        val re = reps.persist(); val mem = members.persist()
        t("reps+members materialize")(println("[probe] reps: " + re.count() + " members: " + mem.count()))
        val init = GraphAnn.initStage(re, cent)
        t("initStage noop")(noop(init))
        var edges = t("init topPerSrc ckpt")(
          GraphAnn.topPerSrc(init, GraphAnn.KnnDegree).localCheckpoint(true))
        for (i <- 1 to GraphAnn.KnnRounds) {
          edges = t(s"descent round $i")(
            GraphAnn.topPerSrc(GraphAnn.descentRound(re, edges), GraphAnn.KnnDegree)
              .localCheckpoint(true))
        }
        t("full query")(noop(GraphAnn.knnGraphTopK(spark, dir)))
      case "kcore" =>
        val docs = Tables(spark, dir, "documents")
        val edges = PageRank.linkGraph(docs)
        t("linkGraph noop")(noop(edges))
        t("docCoreness full")(noop(PageRank.docCoreness(spark, dir)))
      case "link" =>
        val docs = Tables(spark, dir, "documents")
        println("[probe] docs rows: " + docs.count())
        val ex = docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))
        t("explode noop (x2)")(noop(ex)); t("explode noop warm")(noop(ex))
        println("[probe] shingle rows: " + ex.count())
        val rareKeys = ex.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") >= PageRank.RareMinDf && col("df") <= PageRank.RareMaxDf)
          .select("s")
        t("df agg noop")(noop(rareKeys))
        println("[probe] rare keys: " + rareKeys.count())
        val rare = ex.join(rareKeys, Seq("s"))
        t("rare join noop")(noop(rare))
        val edges = rare.select(col("s"), col("doc_id").as("src"))
          .join(rare.select(col("s"), col("doc_id").as("dst")), Seq("s"))
          .filter(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
        t("edges noop")(noop(edges))
        println("[probe] edges: " + edges.count())
        t("linkGraph full warm")(noop(PageRank.linkGraph(docs)))
      case "hits" =>
        val docs = Tables(spark, dir, "documents")
        t("linkGraph noop")(noop(PageRank.linkGraph(docs)))
        t("docHits full")(noop(PageRank.docHits(spark, dir)))
        t("docPageRank full")(noop(PageRank.docPageRank(spark, dir)))
        t("docPersonalizedPageRank full")(noop(PageRank.docPersonalizedPageRank(spark, dir)))
      case "kmeans" =>
        t("kmeans full")(noop(Clustering.kmeansClusters(spark, dir)))
      case "bm25" =>
        t("bm25 tf build")(noop(Tables(spark, dir, "documents")
          .select(col("doc_id"), explode(graft.ops.Dedup.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))))
        t("bm25_topk full")(noop(TextAnalysis.bm25TopK(spark, dir)))
        t("bm25_topk_served full")(noop(TextAnalysis.bm25TopKServed(spark, dir)))
        t("qld_topk full")(noop(TextAnalysis.qldTopK(spark, dir)))
      case other => println(s"[probe] unknown mode $other")
    }
    spark.stop()
  }
}
