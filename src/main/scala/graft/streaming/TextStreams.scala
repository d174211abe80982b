package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Similarity, Tables, TextAnalysis}

/** Stream-static LEXICAL retrieval — the sparse twin of
  * [[VectorStreams.adcServe]], completing the hybrid-RAG serving story:
  * an unbounded stream of query texts scores against a static BM25 index
  * ([[TextAnalysis.bm25Against]] is literally the batch scoring core, so
  * stream/batch parity is structural), and [[hybridServe]] fuses both
  * retrievers per micro-batch with the batch RRF combiner.
  *
  * Same `foreachBatch` rationale as the dense side: per-query top-k and
  * the full-outer fusion join are unbounded-frame operations Structured
  * Streaming cannot express in append mode, but each micro-batch is a
  * closed query set, so the batch plans apply verbatim.
  *
  * Scale shape: the `(doc_id, tok, tf)` index is persisted once — the
  * per-batch work is the query tokenize (batch-sized), a broadcast
  * candidate join against the cached index, and bounded model-leg
  * re-scans. Results land through [[Sinks.idempotentBatchWrite]], so the
  * serving log inherits exactly-once-under-replay.
  */
object TextStreams {

  /** Serve `queryStream` (schema: `q_id long, text string`) against the
    * documents table of `dir`: BM25 top-k per query per micro-batch,
    * written to `outDir/batch_id=N`.
    */
  def bm25Serve(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10): StreamingQuery = {
    val ix = bm25Index(spark, dir)
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Sinks.idempotentBatchWrite(
          TextAnalysis.bm25Score(ix, batch.select(col("q_id"), col("text")), k),
          batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
  }

  /** Hybrid sparse+dense serving: `queryStream` carries BOTH
    * representations (`q_id long, text string, v array<double>`); each
    * micro-batch runs the BM25 leg against the cached term index and the
    * ADC leg against the PQ code table, then fuses with the SAME
    * reciprocal-rank-fusion combiner as the batch `hybrid_rrf_topk`.
    */
  def hybridServe(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10,
      c: Int = 60): StreamingQuery = {
    val ix = bm25Index(spark, dir)
    val corpus = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val books = Similarity.fitPqFrom(corpus, Similarity.PqM, Similarity.PqKs)
    val codes = Similarity.assignCodes(corpus, books, Seq("vec_id")).persist()
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sparse = TextAnalysis
          .bm25Score(ix, batch.select(col("q_id"), col("text")), k)
          .select(col("q_id"), col("doc_id"), col("rank").as("r_sparse"))
        val dense = Similarity
          .adcTopKAgainst(codes,
            batch.select(col("q_id"), col("v").as("q_v")), books, k)
          .select(col("q_id"), col("n_id").as("doc_id"), col("rank").as("r_dense"))
        Sinks.idempotentBatchWrite(
          Similarity.fuseRrf(sparse, dense, k, c), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
  }

  /** [[bm25Serve]] over a LIVE documents table with incremental index
    * maintenance — the lexical twin of
    * [[VectorStreams.adcServeIncremental]]: at each refresh boundary the
    * live table's not-yet-indexed doc_ids (anti-join against the
    * snapshot) tokenize into a staged postings append
    * ([[graft.ops.TextIndex.append]] — work ∝ batch, appends-gated
    * compaction), and serving continues from the grown snapshot. Because
    * BM25's global statistics are mergeable aggregates of the postings
    * (see the [[graft.ops.TextIndex]] contrast with the PQ index), every
    * refresh is EXACT — served rankings equal a from-scratch build over
    * the live corpus, with no drift gate and no re-fit path. A failed
    * refresh logs and keeps serving the previous snapshot.
    */
  def bm25ServeIncremental(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10,
      refreshEvery: Long = 1L): StreamingQuery = {
    import graft.ops.TextIndex
    def liveCorpus() = Tables(spark, dir, "documents").select("doc_id", "text")
    @volatile var index = TextIndex.build(liveCorpus())
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (refreshEvery > 0 && batchId > 0 && batchId % refreshEvery == 0) {
          scala.util.Try {
            val fresh = liveCorpus().join(
              index.tf.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
            TextIndex.append(index, fresh)
          } match {
            case scala.util.Success(updated) =>
              if (!(updated eq index))
                System.err.println(s"[bm25ServeIncremental] batch $batchId: " +
                  s"postings append (appends since compaction: ${updated.appends})")
              index = updated
            case scala.util.Failure(e) =>
              // a failure AFTER the staged promote may have grown tfPath on
              // disk even though no updated index was returned: rebuild the
              // served frame from the on-disk listing so the next refresh's
              // anti-join sees every promoted doc_id (a stale listing would
              // re-append them — duplicated postings, inflated tf/df)
              index = index.copy(tf = spark.read.parquet(index.tfPath))
              System.err.println(s"[bm25ServeIncremental] refresh at batch " +
                s"$batchId failed, serving re-read snapshot: ${e.getMessage}")
          }
        }
        Sinks.idempotentBatchWrite(
          TextIndex.topK(index, batch.select(col("q_id"), col("text")), k),
          batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
  }

  /** The static lexical index — ALL query-independent model legs (tf, df,
    * per-doc length term, scalar stats), each persisted for the serving
    * query's lifetime, so a micro-batch pays only the query tokenize and
    * the broadcast candidate join, never a corpus-scale re-aggregate. */
  private def bm25Index(spark: SparkSession, dir: String): TextAnalysis.Bm25Index =
    TextAnalysis.bm25BuildIndex(Tables(spark, dir, "documents"))

  /** Register the percolator's stored-query set as a WRITTEN parquet
    * table (the index-is-a-table contract: standing alerts must survive
    * restarts and be shared across serving jobs). */
  def writeQuerySet(spark: SparkSession, corpus: DataFrame,
      queryDir: String): Unit =
    TextAnalysis.percolateQuerySet(spark, TextAnalysis.docTokens(corpus))
      .write.mode("overwrite").parquet(queryDir)

  /** Streaming percolator — [[TextAnalysis.percolateAlerts]]'s match core
    * kept live: each incoming micro-batch of documents is tokenized and
    * tested against the FROZEN stored-query table, emitting
    * (query_id, doc_id) alert rows through the exactly-once sink. The
    * match is [[TextAnalysis.firedPairs]] VERBATIM, so the streamed alert
    * log is definitionally the batch predicate over the ingested prefix —
    * and per-doc alerts depend on nothing but the doc and the frozen
    * query table, so micro-batches are embarrassingly independent (no
    * state store at all).
    *
    * Scale shape: per-batch work = batch-sized tokenize + broadcast join
    * against the tiny query table + a (query, doc) aggregate bounded by
    * the batch's matches.
    */
  def percolateServe(docs: DataFrame, queryDir: String,
      outDir: String, ckpt: String): StreamingQuery = {
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val queries = spark.read.parquet(queryDir)
        val alerts = TextAnalysis.firedPairs(
          TextAnalysis.docTokens(batch.toDF()), queries)
        Sinks.idempotentBatchWrite(alerts, batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
  }

  /** Boolean-percolator query registration — the k-AND-NOT generalization's
    * written stored-query table. */
  def writeBoolQuerySet(spark: SparkSession, corpus: DataFrame,
      queryDir: String): Unit =
    TextAnalysis.percolateBoolQuerySet(spark, TextAnalysis.docTokens(corpus))
      .write.mode("overwrite").parquet(queryDir)

  /** Streaming boolean percolator — [[TextStreams.percolateServe]] with
    * the signed match core: each micro-batch fires a stored query iff the
    * doc holds ALL its positive terms and NONE of its negated ones. The
    * match is [[TextAnalysis.firedBoolPairs]] VERBATIM (same
    * batch-equivalence argument — per-doc alerts depend only on the doc
    * and the frozen query table, so no state store). */
  def percolateBoolServe(docs: DataFrame, queryDir: String,
      outDir: String, ckpt: String): StreamingQuery = {
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val queries = spark.read.parquet(queryDir)
        val alerts = TextAnalysis.firedBoolPairs(
          TextAnalysis.docTokens(batch.toDF()), queries)
        Sinks.idempotentBatchWrite(alerts, batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
  }
}
