package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup}

/** Structured Streaming twin of the batch corpus-ingest path: documents
  * arrive on a stream, get PII-scrubbed, fingerprinted, and exact-deduped —
  * the first stages every streaming corpus-ingestion pipeline runs.
  *
  * The projections are the IDENTICAL column expressions the batch operators
  * use ([[graft.ops.Corpus.scrubbed]], the md5 content fingerprint of
  * `TextAnalysis.fingerprint`, [[graft.functions.SimHash64]]) — per-row
  * expressions carry over to streams unchanged. Only dedup needs streaming
  * semantics: `dropDuplicatesWithinWatermark` keys state by the content
  * digest and evicts it once the watermark passes, so state stays bounded
  * however long the stream runs (the batch twin's groupBy-digest has no
  * state to bound).
  *
  * Scrub-before-dedup is deliberate: two documents differing only in the
  * PII they leak (same content, different email) collapse to one — the
  * fingerprint is computed on the REDACTED text.
  */
object DocStreams {

  val DefaultWatermark = "1 hour"

  /** `(doc_id, ts, text)` stream → scrubbed, fingerprinted, deduped docs. */
  def cleanedDocs(docs: DataFrame, watermark: String = DefaultWatermark): DataFrame =
    docs.withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), Corpus.scrubbed(col("text")).as("text"))
      .withColumn("fp",
        md5(lower(graft.pipeline.TextClean.collapseWs(col("text"))).cast("binary")))
      .withColumn("simhash", graft.functions.SimHash64(Dedup.tokens(col("text"))))
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming twin of [[graft.ops.QualityModel.qualityLrScore]]: the
    * fitted classifier is five plan-time literals, so scoring a document
    * stream is a stateless projection — no model runtime, no streaming
    * state, identical column expressions to the batch query (parity is
    * structural via the shared [[graft.ops.QualityModel.logitCol]]).
    * Low-quality docs drop at ingest, before they cost dedup state or
    * sink storage — where a production pipeline wants the filter.
    */
  def qualityFiltered(docs: DataFrame, weights: Array[Double]): DataFrame = {
    val logit = graft.ops.QualityModel.logitCol(weights)
    docs
      .select(col("doc_id"), col("ts"), col("text"),
        round(logit, 6).as("lr_logit"), (logit > 0.0).as("keep"))
      .filter(col("keep"))
      .drop("keep")
  }


  /** Streaming twin of [[graft.ops.QualityModel.dsirWeights]] — DSIR
    * selection at ingest. The fitted bucket model (≤ 64 entries,
    * [[graft.ops.QualityModel.dsirModel]]) embeds as a plan-time MAP
    * literal; each document scores the mean log-likelihood ratio of its
    * tokens' md5 buckets entirely inside one projection:
    * `aggregate(transform(tokens, t → m[bucket(t)]), …)` — stateless, no
    * streaming state, no join, unseen buckets falling back to the
    * zero-count smoothed default. Docs below `minWeight` drop at ingest,
    * the DSIR selection step applied where it is cheapest.
    */
  def dsirScored(docs: DataFrame, model: Map[Long, Double],
      default: Double, minWeight: Double = Double.NegativeInfinity): DataFrame = {
    val mapLit = map(model.toSeq.sortBy(_._1)
      .flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
    val toks = Dedup.tokens(col("text"))
    def bucket(t: org.apache.spark.sql.Column) =
      conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("long") %
        graft.ops.QualityModel.DsirBuckets
    val total = aggregate(
      transform(toks, t => coalesce(element_at(mapLit, bucket(t)), lit(default))),
      lit(0.0), (acc, x) => acc + x)
    docs
      .select(col("doc_id"), col("ts"), col("text"), size(toks).as("n_tokens"),
        round(total / size(toks), 4).as("dsir_weight"))
      .filter(col("dsir_weight") >= minWeight)
  }

  /** Streaming twin of [[graft.ops.Dedup.incrementalNearDup]] — the
    * production ingest: documents STREAM in and near-dup-check against a
    * STATIC corpus band index (`Dedup.bandIndex` / `Dedup.shingleIndex`,
    * the persisted-table index artifacts of the batch path). The band
    * candidate join is a stream-static equi-join, which Structured
    * Streaming executes STATELESSLY — per micro-batch, no streaming state
    * at all for candidates; the only state is the pair-dedup, keyed within
    * the watermark (a pair can collide in several bands and micro-batches
    * apart, but never beyond the event-time horizon).
    *
    * Same expressions as the batch path end-to-end: map-side
    * [[graft.functions.MinHashBands]] over the same shingles, exact-Jaccard
    * verify against the index's stored shingle arrays — parity with the
    * batch restriction is spec-pinned.
    */
  def nearDupAgainstIndex(
      docs: DataFrame,
      histBands: DataFrame,
      histShingles: DataFrame,
      watermark: String = DefaultWatermark): DataFrame = {
    // fail fast on a hash-scheme mismatch — this is the OTHER persisted-
    // band-artifact entry point beside refreshServe, and a stale-version
    // store here silently streams zero near-dups forever (the failure
    // mode the mh_scheme stamp exists to catch)
    val hb = graft.ops.Dedup.requireBandScheme(histBands)
    val inc = docs.withWatermark("ts", watermark)
      .select(col("doc_id").as("inc_id"), col("ts"),
        Dedup.shingles(col("text")).as("inc_sh"))
    inc
      .select(col("inc_id"), col("ts"), col("inc_sh"),
        posexplode(graft.functions.MinHashBands(
          col("inc_sh"), Dedup.MinhashK, Dedup.Bands)).as(Seq("band", "band_hash")))
      .join(hb, Seq("band", "band_hash"))
      // NO broadcast hint: the shingle store is corpus-sized at production
      // scale (the batch path ships shingles only for colliding ids for the
      // same reason). This equi-join runs AFTER the band join, so only the
      // micro-batch's colliding hist_ids are ever fetched; the planner
      // picks broadcast on its own when the store is actually small.
      .join(histShingles, Seq("hist_id"))
      .withColumn("jac", round(Dedup.jaccard(col("inc_sh"), col("hist_sh")), 4))
      .filter(col("jac") >= Dedup.JaccardThreshold)
      .select("inc_id", "hist_id", "jac", "ts")
      .dropDuplicatesWithinWatermark("inc_id", "hist_id")
      .select("inc_id", "hist_id", "jac")
  }

  /** Streaming twin of [[graft.ops.BpeTrain.bpeSegmentStats]]: documents
    * stream in and are token-counted against a STATIC trained
    * segmentation table (the tokenizer artifact — trained once, persisted
    * like the ANN code tables). Per-doc counting is a closed aggregate
    * within a micro-batch, so it runs through `foreachBatch` with the
    * SHARED batch serving core ([[graft.ops.BpeTrain.segmentStatsAgainst]]
    * — stream/batch parity is structural), landing through the
    * exactly-once sink. This is where a training pipeline meters its
    * token budget: at ingest, per batch, not in a post-hoc corpus pass.
    */
  def bpeCountServe(
      docStream: DataFrame,
      seg: DataFrame,
      outDir: String,
      ckpt: String): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        Sinks.idempotentBatchWrite(
          graft.ops.BpeTrain.segmentStatsAgainst(
            seg, batch.select(col("doc_id"), col("text"))),
          batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()

  /** Write the refresh composite's history index artifacts
    * ([[graft.ops.CorpusRefresh.indexArtifactsOf]]) as the BASE partition
    * of a growable artifact store — the "last full run" a streaming
    * ingest refreshes against. */
  def writeRefreshArtifacts(history: DataFrame, artifactDir: String): Unit = {
    val (c, b, s) = graft.ops.CorpusRefresh.indexArtifactsOf(history)
    c.write.mode("overwrite").parquet(s"$artifactDir/canon/part=base")
    b.write.mode("overwrite").parquet(s"$artifactDir/bands/part=base")
    s.write.mode("overwrite").parquet(s"$artifactDir/shingles/part=base")
  }

  /** Streaming twin of [[graft.ops.CorpusRefresh]] — CONTINUOUS ingest:
    * each micro-batch of raw docs runs the full refresh funnel against
    * the CURRENT artifact store (base = the last full run, plus every
    * prior micro-batch's landed docs), lands its fate rows through the
    * exactly-once sink, and GROWS the store by its own landed docs'
    * artifacts (curated = scrubbed text — what a full run would have
    * stored). Growth writes go to per-batch `part=b<id>` partitions with
    * overwrite, so a replayed micro-batch rewrites its own partition —
    * idempotent end to end (the bm25ServeIncremental staging discipline).
    *
    * The refresh ≡ rebuild theorem composes across micro-batches: with a
    * curated base and id-ordered batches, the streamed fates equal BOTH
    * the sequential batch refreshes AND one full rebuild over
    * base ∪ all batches — spec-pinned.
    */
  def refreshServe(
      spark: org.apache.spark.sql.SparkSession,
      docStream: DataFrame,
      artifactDir: String,
      outDir: String,
      ckpt: String): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.ops.CorpusRefresh
        val canon = spark.read.parquet(s"$artifactDir/canon").select("canon")
        // the stamped frame passes through whole: refreshAgainstIndex owns
        // the mh_scheme fail-fast guard (a stale-version band store never
        // collides with fresh hashes → zero near-dups, silently). A store
        // written BEFORE versioning has no mh_scheme column at all — give
        // it the guard's actionable message too, not an unresolved-column
        // AnalysisException from the select below
        val bandsRaw = spark.read.parquet(s"$artifactDir/bands")
        require(bandsRaw.columns.contains("mh_scheme"),
          s"band store at $artifactDir/bands predates scheme versioning — " +
            "rebuild the index with the current MinHashBands scheme")
        val bands = bandsRaw.select("band", "band_hash", "hist_id", "mh_scheme")
        val shingles = spark.read.parquet(s"$artifactDir/shingles")
          .select("doc_id", "sh")
        val b = batch.select("doc_id", "source", "text")
        Sinks.idempotentBatchWrite(
          CorpusRefresh.refreshAgainstIndex(canon, bands, shingles, b),
          batchId, outDir)
        // grow the store by THIS batch's landed docs (their curated —
        // scrubbed — text), from the just-written fate partition
        val landedIds = spark.read.parquet(s"$outDir/batch_id=$batchId")
          .filter(col("fate") === "landed").select("doc_id")
        val landed = b.join(landedIds, Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            graft.ops.Corpus.scrubbed(col("text")).as("text"))
        val (c2, b2, s2) = CorpusRefresh.indexArtifactsOf(landed)
        c2.write.mode("overwrite").parquet(s"$artifactDir/canon/part=b$batchId")
        b2.write.mode("overwrite").parquet(s"$artifactDir/bands/part=b$batchId")
        s2.write.mode("overwrite").parquet(s"$artifactDir/shingles/part=b$batchId")
      }
      .option("checkpointLocation", ckpt)
      .start()
}
