package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Negative-mining operators for contrastive training data — the pair
  * construction step of CLIP/SimCLR/DPR-style pipelines: every anchor
  * needs negatives, and WHICH negatives (random in-batch vs
  * semantically-hard) is the dataset-quality lever the training recipe
  * turns. Both operators are deterministic end to end (hash-derived
  * batches, seeded tie-breaks, data-fitted nothing), so the emitted pair
  * set is reproducible across runs, engines, and backfills — the
  * [[Sampling]] order-key discipline applied to pair construction.
  *
  * The `embeddings.label` column stands in for the positive-equivalence
  * class (caption group / duplicate cluster / query-relevant set): a
  * valid negative is any vector with a DIFFERENT label.
  */
object Contrastive {

  /** Negatives kept per anchor. */
  val NegsPerAnchor = 4

  /** In-batch negative sampling — the standard contrastive recipe:
    * vectors are grouped into pseudo-random BATCHES (a pure function of
    * vec_id, like a shuffled data-loader with a pinned seed), and each
    * anchor draws its negatives from its own batch's different-label
    * members, ranked by a seeded pair hash. No similarity computation at
    * all — these are the "easy", unbiased negatives.
    *
    * Scale shape: batch assignment is a narrow projection; pairing is a
    * batch-keyed equi self-join (|batch|² work per batch, batch size is a
    * constant of the recipe, so total work is linear in corpus); the
    * per-anchor keep is a window over ≤|batch| rows. One shuffle per
    * side, no corpus-wide window.
    */
  def batchNegatives(spark: SparkSession, dir: String,
      negs: Int = NegsPerAnchor): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        // hex nibble of the batch hash: a pinned-seed loader shuffle
        // (the [[Sampling.shuffleShards]] locate idiom — hex char → 0..15)
        expr("cast(locate(substring(md5(concat('b7:', cast(vec_id as string))), 1, 1), '0123456789abcdef') - 1 as int)")
          .as("batch"))
    val anchors = e.select(col("batch"), col("vec_id").as("anchor_id"),
      col("label").as("anchor_label"))
    val cands = e.select(col("batch"), col("vec_id").as("neg_id"),
      col("label").as("neg_label"))
    val paired = anchors.join(cands, Seq("batch"))
      .filter(col("anchor_label") =!= col("neg_label"))
      .withColumn("okey", md5(concat(lit("n11:"),
        col("anchor_id").cast("string"), lit(":"), col("neg_id").cast("string"))))
    val w = Window.partitionBy("anchor_id").orderBy(col("okey"), col("neg_id"))
    paired.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= negs)
      .select("anchor_id", "anchor_label", "neg_id", "neg_label", "neg_rank")
      .orderBy("anchor_id", "neg_rank")
  }

  val batchNegativesSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    (strpos('0123456789abcdef',
       |       substr(md5('b7:' || vec_id::VARCHAR), 1, 1)) - 1)::INT AS batch
       |  FROM embeddings
       |)
       |SELECT anchor_id, anchor_label, neg_id, neg_label, neg_rank FROM (
       |  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
       |    c.vec_id AS neg_id, c.label AS neg_label,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY md5('n11:' || a.vec_id::VARCHAR || ':' || c.vec_id::VARCHAR),
       |               c.vec_id) AS neg_rank
       |  FROM e a JOIN e c ON a.batch = c.batch AND a.label <> c.label)
       |WHERE neg_rank <= $NegsPerAnchor
       |ORDER BY anchor_id, neg_rank""".stripMargin

  /** Hard-negative mining — the quality upgrade over [[batchNegatives]]:
    * for each anchor, the most SIMILAR vectors with a different label
    * (the decision-boundary examples DPR/ANCE mine between training
    * rounds). Candidates come from the shared LSH index
    * ([[Similarity.lshBucket]] — same planes, same banded shape as
    * `ann_lsh_topk`), so no corpus-wide cosine scan: only bucket-mates
    * are scored, then exact cosine ranks the different-label survivors.
    *
    * Scale shape: identical to `ann_lsh_topk` (banded index persisted,
    * bucket equi-join, candidate-only exact scoring, per-anchor window)
    * plus one label inequation in the candidate filter — hard-negative
    * mining IS an ANN query with a class-exclusion predicate.
    */
  def hardNegativesLsh(spark: SparkSession, dir: String,
      k: Int = NegsPerAnchor): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val buckets = (0 until Similarity.LshTables)
      .map(l => Similarity.lshBucket(col("v"), Similarity.LshBits, Similarity.LshDims, l))
    val banded = e.select(col("vec_id"), col("label"),
        posexplode(array(buckets: _*)).as(Seq("table", "bucket")))
      .persist()
    val anchors = banded.filter(col("vec_id") % 50 === 0)
      .select(col("table"), col("bucket"),
        col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
    val cand = banded.join(broadcast(anchors), Seq("table", "bucket"))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"),
        col("vec_id").as("neg_id"), col("label").as("neg_label"))
      .dropDuplicates("anchor_id", "neg_id")
    val vecs = e.select(col("vec_id"), col("v"))
    val aVecs = vecs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("anchor_id"), col("v").as("a_v"))
    val scored = cand
      .join(vecs.select(col("vec_id").as("neg_id"), col("v")), Seq("neg_id"))
      .join(broadcast(aVecs), Seq("anchor_id"))
      .select(col("anchor_id"), col("anchor_label"), col("neg_id"),
        col("neg_label"), Similarity.cosine(col("a_v"), col("v")).as("c"))
    val out = {
      val w = Window.partitionBy("anchor_id").orderBy(col("c").desc, col("neg_id"))
      scored.withColumn("neg_rank", row_number().over(w))
        .filter(col("neg_rank") <= k)
        .select(col("anchor_id"), col("anchor_label"), col("neg_id"),
          col("neg_label"), col("neg_rank"), round(col("c"), 4).as("cos"))
        .orderBy("anchor_id", "neg_rank")
    }
    banded.unpersist()
    out
  }

  /** Generated exact oracle: the shared banded CTE (embedded plane
    * literals — [[Similarity.bandedSqlCtes]]) with the label-exclusion
    * predicate in the candidate join. */
  def hardNegativesLshSql: String =
    s"""${Similarity.bandedSqlCtes}, lab AS (
       |  SELECT vec_id, label FROM embeddings
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS anchor_id, ql.label AS anchor_label,
       |    e.vec_id AS neg_id, el.label AS neg_label
       |  FROM banded e JOIN banded q ON e.tbl = q.tbl AND e.bucket = q.bucket
       |  JOIN lab ql ON ql.vec_id = q.vec_id
       |  JOIN lab el ON el.vec_id = e.vec_id
       |  WHERE q.vec_id % 50 = 0 AND el.label <> ql.label
       |)
       |SELECT anchor_id, anchor_label, neg_id, neg_label, neg_rank, cos FROM (
       |  SELECT c.anchor_id, c.anchor_label, c.neg_id, c.neg_label,
       |    row_number() OVER (PARTITION BY c.anchor_id
       |      ORDER BY list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) DESC,
       |               c.neg_id) AS neg_rank,
       |    round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 4) AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.anchor_id
       |  JOIN embeddings ne ON ne.vec_id = c.neg_id)
       |WHERE neg_rank <= $NegsPerAnchor
       |ORDER BY anchor_id, neg_rank""".stripMargin
}
