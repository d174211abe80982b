package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Similarity, Tables}

/** Stream-static ANN serving — the ingest-side twin of the batch PQ
  * family: an unbounded stream of query vectors scores against a STATIC
  * PQ-coded corpus with the exact scoring tail the batch `pq_adc_topk`
  * plans ([[Similarity.adcTopKAgainst]] is literally shared, so
  * stream/batch parity is structural, not re-implemented).
  *
  * `foreachBatch` is the right host, not a streaming window: per-query
  * top-k ranking is a window function, which Structured Streaming cannot
  * express on an unbounded frame in append mode — but each micro-batch is
  * a CLOSED query set, so the batch plan applies verbatim per batch. The
  * results land through [[Sinks.idempotentBatchWrite]], so the serving log
  * inherits the exactly-once-under-replay contract.
  *
  * Scale shape: the coded corpus (8 bytes/vector) is persisted and
  * re-scanned per micro-batch (rebuilt every `refreshEvery` batches when
  * the corpus is live); the query batch collapses to (id, LUT) before its
  * broadcast. At 1000 executors each micro-batch is one shuffle-free pass
  * over the code table.
  */
object VectorStreams {

  /** Test hooks: the most recently built serve index states. The
    * termination listener fires ASYNCHRONOUSLY after `stop()` returns, so a
    * teardown spec needs a handle to poll the storage level on — these are
    * that handle, nothing in the serving path reads them. */
  @volatile private[graft] var lastFilteredIndex: Similarity.FilteredIndex = null
  @volatile private[graft] var lastMaxSimIndex: graft.ops.MaxSim.MaxSimIndex = null

  /** Register a one-shot listener that runs `release` when `q` terminates
    * (stop or failure), then removes itself — the teardown half of the
    * index-outside-the-loop discipline: a serve that holds persisted index
    * state ([[filteredAdcServe]], [[maxSimServe]]) must not leak it for
    * the SparkSession lifetime after the stream stops. Listener dispatch
    * is asynchronous, so callers that need the release observed (tests)
    * poll the storage state rather than assuming it on stop() return. */
  private def releaseOnTermination(
      spark: SparkSession, q: StreamingQuery)(release: () => Unit): StreamingQuery = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        // match on runId, not id: a query restarted from the same
        // checkpoint keeps its id, and the OLD run's async termination
        // event must not release the NEW run's live index
        if (e.runId == q.runId) {
          try release() finally spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    q
  }

  /** Start serving `queryStream` (schema: `vec_id long, v array<double>`)
    * against the embeddings table of `dir`. Output per batch: the ADC
    * top-k per query, written to `outDir/batch_id=N`.
    *
    * `refreshEvery = N > 0` turns the static index into a LIVE one: every
    * N micro-batches the codebooks re-fit and the code table re-persists
    * from the CURRENT state of the corpus table, then swap in without
    * stream restart — the production serving loop where the corpus grows
    * under the index. The swap is atomic per micro-batch (a batch scores
    * entirely against one (codebooks, codes) pair — the pair is read once
    * at batch start), and replay-safe: a replayed refresh batch just
    * rebuilds from the table again, and the sink's idempotent batch write
    * keeps the output exactly-once. The stale cache unpersists only AFTER
    * the rebuild, so a fit failure leaves the previous index serving.
    * Default 0 = fixed index for the query's lifetime (a write-once
    * corpus), exactly the old contract.
    */
  def adcServe(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10,
      refreshEvery: Long = 0L): StreamingQuery = {
    // One (codebooks, coded-corpus) build — the shared on-disk index
    // artifact ([[graft.ops.IncrementalIndex.build]]: written parquet
    // snapshot, never a cached plan over the live directory — see the
    // round-11 lesson documented there). Fits via fitPqFrom on a FRESH
    // read, NOT the session-cached fitPq: the cache is keyed by dir and
    // assumes an immutable table, which is exactly what a live refresh
    // must not assume — a cached fit would re-encode new codes against
    // STALE codebooks and silently never re-fit. (Deterministic fit ⇒
    // identical books to the cache while the corpus is unchanged, so the
    // static case is unaffected.)
    import graft.ops.IncrementalIndex
    def buildIndex(): IncrementalIndex.PqIndex =
      IncrementalIndex.build(Tables(spark, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")))
    @volatile var index = buildIndex()
    val q = queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (refreshEvery > 0 && batchId > 0 && batchId % refreshEvery == 0) {
          // a failed rebuild (corpus mid-write, fit sample too small) must
          // NOT kill the serving query — log and keep the previous index;
          // the next refresh boundary retries. A successful swap deletes
          // the superseded snapshot directory promptly.
          scala.util.Try(buildIndex()) match {
            case scala.util.Success(fresh) =>
              val stale = index
              index = fresh
              IncrementalIndex.release(stale)
            case scala.util.Failure(e) =>
              System.err.println(
                s"[adcServe] index refresh at batch $batchId failed, serving previous index: ${e.getMessage}")
          }
        }
        val idx = index
        val queries = batch.select(col("vec_id").as("q_id"), col("v").as("q_v"))
        Sinks.idempotentBatchWrite(
          IncrementalIndex.topK(idx, queries, k), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    // disk-shaped teardown, symmetric with the persisted-frame serves:
    // the FINAL snapshot directory (refresh swaps release superseded ones
    // promptly) leaves disk when the stream terminates
    releaseOnTermination(spark, q)(() => IncrementalIndex.release(index))
  }

  /** [[adcServe]] with INCREMENTAL index maintenance
    * ([[graft.ops.IncrementalIndex]]): at each refresh boundary the live
    * corpus is re-read and only the vectors NOT yet indexed are encoded —
    * with the frozen codebooks — and unioned into the code table; a full
    * re-fit runs only when the new batch's measured quantization error
    * drifts past `driftFactor ×` the fit-time baseline. The 100-TB refresh
    * cost drops from corpus-sized (re-fit + re-encode everything) to
    * batch-sized, the `incremental_near_dup` ingest shape applied to the
    * vector index. Small-file growth is bounded by the index's own
    * appends-gated compaction ([[graft.ops.IncrementalIndex.CompactEvery]]):
    * every Nth no-drift refresh rewrites and swaps the snapshot directory,
    * so a long-running ingest never degrades the codes scan. The refresh
    * boundary also runs an ERASURE SYNC: ids indexed but gone from the
    * live table (deleted upstream — the GDPR cascade reaching the vector
    * store) are removed via [[graft.ops.IncrementalIndex.remove]], so the
    * serving index mirrors a corpus that SHRINKS as well as grows and the
    * erased codes' bytes leave disk. Failure isolation matches
    * [[adcServe]]: erasure and append each run inside their own Try with
    * results eagerly materialized, so a failed refresh keeps the previous
    * (or pruned) index serving.
    */
  def adcServeIncremental(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10,
      refreshEvery: Long = 1L,
      driftFactor: Double = 1.5): StreamingQuery = {
    import graft.ops.IncrementalIndex
    def liveCorpus() = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    @volatile var index = IncrementalIndex.build(liveCorpus())
    val q = queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (refreshEvery > 0 && batchId > 0 && batchId % refreshEvery == 0) {
          // ERASURE SYNC first, under its own failure isolation: ids
          // indexed but no longer in the live table were erased upstream
          // (the GDPR cascade reaching the vector store) — drop them via
          // IncrementalIndex.remove, which rewrites the snapshot minus
          // the erased codes so their bytes leave disk. Sequenced BEFORE
          // the growth sync so a later append failure still leaves the
          // valid pruned index serving; remove's own swap discipline
          // (write-new, delete-old-last) means ITS failure leaves the
          // previous index intact.
          scala.util.Try {
            // no caller-side checkpoint: remove() owns the materialize-
            // before-delete invariant since the r16 advice fix — a second
            // eager checkpoint here would just double the storage blocks
            val gone = index.codes.select("vec_id")
              .join(liveCorpus().select("vec_id"), Seq("vec_id"), "left_anti")
            if (gone.isEmpty) index else IncrementalIndex.remove(index, gone)
          } match {
            case scala.util.Success(pruned) =>
              if (!(pruned eq index))
                System.err.println(s"[adcServeIncremental] batch $batchId: " +
                  "erased upstream-deleted vectors from the serving index")
              index = pruned
            case scala.util.Failure(e) =>
              System.err.println(
                s"[adcServeIncremental] erasure sync at batch $batchId failed, serving previous index: ${e.getMessage}")
          }
          scala.util.Try {
            val grown = liveCorpus()
            val fresh = grown.join(index.codes.select("vec_id"), Seq("vec_id"), "left_anti")
            IncrementalIndex.appendWith(index, fresh, grown, driftFactor)
          } match {
            case scala.util.Success(updated) =>
              if (!(updated eq index))
                System.err.println(s"[adcServeIncremental] batch $batchId refresh: " +
                  (if (updated.books eq index.books)
                    s"frozen-books append (appends since fit: ${updated.appends})"
                  else "drift-triggered re-fit"))
              index = updated
            case scala.util.Failure(e) =>
              System.err.println(
                s"[adcServeIncremental] refresh at batch $batchId failed, serving previous index: ${e.getMessage}")
          }
        }
        val idx = index
        val queries = batch.select(col("vec_id").as("q_id"), col("v").as("q_v"))
        Sinks.idempotentBatchWrite(
          IncrementalIndex.topK(idx, queries, k), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    // same disk-shaped teardown as adcServe: whatever snapshot the
    // incremental maintenance is serving when the stream terminates
    releaseOnTermination(spark, q)(() => IncrementalIndex.release(index))
  }

  /** Metadata-FILTERED ADC serving — the streaming twin of the batch
    * `ivf_pq_filtered_topk`: an unbounded stream of `(vec_id, v, label)`
    * queries scores per micro-batch against the static (cell, label)-keyed
    * code table, with the label predicate riding the candidate equi-join
    * KEY and the label-aware adaptive probe budget deciding how many
    * score-ranked cells each query opens
    * ([[Similarity.ivfPqFilteredTopKFor]] is literally shared, so
    * stream/batch parity is structural). Same `foreachBatch` rationale as
    * [[adcServe]] (per-query top-k needs a CLOSED query set — a
    * micro-batch is one), same exactly-once sink. Per-query independence
    * makes the stream exact: a query's probes, candidates, and ranking
    * depend only on the static index and its own (vector, label), never
    * on which micro-batch carried it.
    */
  def filteredAdcServe(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10): StreamingQuery = {
    // the index state (fits + persisted cell assignment + codes) is built
    // ONCE, outside the loop — the adcServe discipline; a per-batch
    // ivfPqFilteredTopKFor call would re-fit and re-assign the corpus
    // every micro-batch and leak one persisted frame per batch
    val index = Similarity.buildFilteredIndex(spark, dir)
    lastFilteredIndex = index
    val q = queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val queries = batch.select(
          col("vec_id").as("q_id"), col("v").as("q_v"), col("label"))
        Sinks.idempotentBatchWrite(
          Similarity.ivfPqFilteredTopKAgainst(index, queries, k), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    releaseOnTermination(spark, q)(() => Similarity.releaseFilteredIndex(index))
  }

  /** Late-interaction (MaxSim) serving — the streaming twin of the batch
    * `maxsim_topk`: an unbounded stream of multi-vector query docs (rows
    * `(doc, chunk, v)`; a doc's chunks MUST arrive within one micro-batch —
    * in production the upstream assembler is a session window keyed on the
    * doc id) scores per micro-batch against the static chunk-level LSH
    * index ([[graft.ops.MaxSim.maxSimTopKFor]] is literally shared, so
    * stream/batch parity is structural). Per-query-doc independence makes
    * the stream exact; same exactly-once sink.
    */
  def maxSimServe(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10): StreamingQuery = {
    // chunk table + persisted chunk-level LSH index built ONCE (the
    // adcServe discipline) — not per micro-batch
    val index = graft.ops.MaxSim.buildMaxSimIndex(spark, dir)
    lastMaxSimIndex = index
    val q = queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val qChunks = batch.select(
          col("doc").as("q_doc"), col("chunk").as("qi"), col("v").as("q_v"))
        Sinks.idempotentBatchWrite(
          graft.ops.MaxSim.maxSimTopKAgainst(index, qChunks, k), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    releaseOnTermination(spark, q)(() => graft.ops.MaxSim.releaseMaxSimIndex(index))
  }

  /** Diversified serving: each micro-batch of query vectors runs the MMR
    * re-rank ([[Similarity.mmrRerankFor]] — literally shared with the
    * batch `mmr_rerank_topk`, so parity is structural) against the static
    * corpus. Per-query independence is what makes the stream exact: a
    * query's greedy selection depends only on its own candidate set,
    * never on which micro-batch carried it. Same `foreachBatch` rationale
    * as [[adcServe]] (per-query top-k and the greedy fold need a CLOSED
    * query set, which a micro-batch is), same exactly-once sink.
    */
  def mmrServe(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 8,
      nCand: Int = 20): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val queries = batch.select(col("vec_id").as("q_id"), col("v").as("q_v"))
        Sinks.idempotentBatchWrite(
          Similarity.mmrRerankFor(spark, dir, queries, k, nCand), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
}
