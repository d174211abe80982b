package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Append-only incremental maintenance for the PQ/ADC index family.
  *
  * The round-10 serving loop ([[graft.streaming.VectorStreams.adcServe]])
  * re-fits codebooks and re-encodes the WHOLE corpus on every refresh —
  * correct, but at 100 TB a full re-encode per refresh is the cost of
  * rebuilding the index from scratch while the typical refresh only adds
  * an ingest batch that is orders of magnitude smaller than the corpus.
  * This is the `incremental_near_dup` shape applied to the vector index:
  * work is proportional to the INCOMING batch, history is never
  * re-processed — until measured drift says the frozen model no longer
  * fits the data, at which point a full deterministic re-fit runs.
  *
  * Mechanics:
  *  - `build` fits codebooks (bounded driver-side sample, the
  *    [[Similarity.fitPqFrom]] discipline), encodes + persists the code
  *    table, and records the corpus' mean quantization error as the drift
  *    baseline.
  *  - `append` encodes ONLY the new batch with the FROZEN codebooks and
  *    unions it into the code table — one narrow pass over the batch, the
  *    historical codes untouched. Before encoding it measures the batch's
  *    mean quantization error under the frozen books; if that exceeds
  *    `driftFactor ×` the fit-time baseline, the batch's distribution has
  *    moved away from what the codebooks were fitted on (recall would decay
  *    silently), so the index re-fits over the grown corpus instead —
  *    deterministic, so the result is bit-identical to `build` on that
  *    corpus.
  *  - `topK` serves queries through the SHARED batch scoring tail
  *    ([[Similarity.adcTopKAgainst]]), so incremental/full index parity is
  *    structural.
  *
  * Scale shape: the drift statistic is one scan-and-aggregate over the
  * BATCH (never the corpus); the no-drift path's only corpus-sized action
  * is the lazy union of an already-persisted frame with the newly coded
  * batch. At production scale the code table is a partitioned table and
  * `append` is an `INSERT INTO`; the DataFrame union here is the
  * single-session rendering of the same contract.
  */
object IncrementalIndex {

  /** The served index artifact. `corpus` is the raw `(vec_id, v)` source
    * the index derives from (needed only on the re-fit path); `baseErr` is
    * the fit-time mean quantization error the drift test compares against;
    * `appends` counts no-refit unions since the last fit (observability +
    * spec hook). */
  final case class PqIndex(
      books: Array[Array[Array[Double]]],
      codes: DataFrame,
      corpus: DataFrame,
      baseErr: Double,
      appends: Int)

  /** Materialize the code table as a lineage-free SNAPSHOT
    * (`localCheckpoint(eager = true)`), not a lazy `persist`: the index
    * serves against a LIVE corpus directory, and a persisted plan still
    * carries the source scan in its lineage — any cache bypass or
    * recompute (observed under the foreachBatch-cloned session) silently
    * re-derives "the index" from the CURRENT directory contents, which
    * (a) breaks the new-vector anti-join (everything looks indexed) and
    * (b) violates the atomic (books, codes) pair contract. Checkpointing
    * cuts the plan at a materialized RDD, so the snapshot can never see a
    * later append. Eager ⇒ a scan failure surfaces inside the caller's
    * failure-isolation Try, not at the first serving batch; superseded
    * snapshots release via the ContextCleaner once the index reference
    * drops them (Dataset.unpersist on a checkpointed frame is a no-op). */
  private def eagerSnapshot(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Full build: fit, encode, eagerly persist, baseline the drift
    * statistic. */
  def build(corpus: DataFrame,
      m: Int = Similarity.PqM, ks: Int = Similarity.PqKs): PqIndex = {
    val books = Similarity.fitPqFrom(corpus, m, ks)
    val codes = eagerSnapshot(Similarity.assignCodes(corpus, books, Seq("vec_id")))
    PqIndex(books, codes, corpus, quantizationError(corpus, books), 0)
  }

  /** Mean per-vector quantization error under `books`: Σ over subspaces of
    * the squared L2 distance to the nearest codeword, averaged over `e`.
    * Pure column arithmetic (dist² = |sub|² − 2·max(⟨sub,c⟩ − |c|²/2), the
    * same score the encoder maximizes) + one scalar aggregate — a single
    * narrow pass, no shuffle beyond the partial-agg exchange.
    */
  private[ops] def quantizationError(
      e: DataFrame, books: Array[Array[Array[Double]]]): Double = {
    val dsub = books(0)(0).length
    val errCols = books.zipWithIndex.map { case (book, j) =>
      val sub = slice(col("v"), j * dsub + 1, dsub)
      val bestScore = greatest(book.map { c =>
        val halfNormSq = c.map(x => x * x).sum / 2.0
        graft.functions.DotProduct(sub, lit(c)) - halfNormSq
      }: _*)
      graft.functions.DotProduct(sub, sub) - bestScore * 2.0
    }
    e.select(errCols.reduce(_ + _).as("qerr"))
      .agg(avg("qerr")).head().getDouble(0)
  }

  /** Append `batch` (schema `vec_id, v`; ids disjoint from the indexed
    * corpus — the caller's ingest contract). No drift → frozen-books
    * encode + union (work ∝ batch). Drift → full deterministic re-fit over
    * `grown`. Either way the superseded code table is unpersisted only
    * after its replacement is live. */
  def append(idx: PqIndex, batch: DataFrame, driftFactor: Double = 1.5): PqIndex =
    appendWith(idx, batch, idx.corpus.unionByName(batch), driftFactor)

  /** [[append]] with the grown corpus supplied explicitly — the streaming
    * refresh path already holds a fresh read of the live table and must
    * not union a stale file-listing snapshot. */
  def appendWith(idx: PqIndex, batch: DataFrame, grown: DataFrame,
      driftFactor: Double = 1.5): PqIndex = {
    if (batch.isEmpty) return idx // nothing new (avg over zero rows is null)
    val batchErr = quantizationError(batch, idx.books)
    if (batchErr > driftFactor * idx.baseErr) {
      val fresh = build(grown)
      idx.codes.unpersist()
      fresh
    } else {
      val fresh = eagerSnapshot(idx.codes
        .unionByName(Similarity.assignCodes(batch, idx.books, Seq("vec_id"))))
      idx.codes.unpersist()
      idx.copy(codes = fresh, corpus = grown, appends = idx.appends + 1)
    }
  }

  /** Serve a query batch (`q_id`, `q_v`) — the shared ADC scan+rank tail,
    * so results are definitionally comparable with the batch PQ family. */
  def topK(idx: PqIndex, queries: DataFrame, k: Int = 10): DataFrame =
    Similarity.adcTopKAgainst(idx.codes, queries, idx.books, k)
}
