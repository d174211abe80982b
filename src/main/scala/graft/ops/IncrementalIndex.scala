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
  *    [[Similarity.fitPqFrom]] discipline), encodes the corpus, WRITES
  *    the code table as an on-disk parquet snapshot (see [[build]] for
  *    why a cached plan is not an index artifact), and records the
  *    corpus' mean quantization error as the drift baseline.
  *  - `append` encodes ONLY the new batch with the FROZEN codebooks and
  *    appends the files into the index directory — one narrow pass over
  *    the batch, the historical codes untouched on disk. Before encoding
  *    it measures the batch's mean quantization error under the frozen
  *    books; if that exceeds `driftFactor ×` the fit-time baseline, the
  *    batch's distribution has moved away from what the codebooks were
  *    fitted on (recall would decay silently), so the index re-fits over
  *    the grown corpus instead — deterministic, so the result is
  *    bit-identical to `build` on that corpus.
  *  - `topK` serves queries through the SHARED batch scoring tail
  *    ([[Similarity.adcTopKAgainst]]), so incremental/full index parity is
  *    structural.
  *
  * Scale shape: the drift statistic is one scan-and-aggregate over the
  * BATCH (never the corpus); the no-drift path touches only batch-sized
  * data. The code table IS a table — at production scale a catalog table
  * and `append` an `INSERT INTO`; the tmp-dir parquet here is the
  * single-session rendering of exactly that contract.
  */
object IncrementalIndex {

  /** The served index artifact. `codes` is an immutable read over
    * `codesPath` — the ON-DISK code table (see [[snapshotDir]]); `corpus`
    * is the raw `(vec_id, v)` source the index derives from (needed only
    * on the re-fit path); `baseErr` is the fit-time mean quantization
    * error the drift test compares against; `appends` counts no-refit
    * unions since the last fit (observability + spec hook). */
  final case class PqIndex(
      books: Array[Array[Array[Double]]],
      codes: DataFrame,
      codesPath: String,
      corpus: DataFrame,
      baseErr: Double,
      appends: Int)

  /** The code table is a WRITTEN parquet snapshot, not a cached plan.
    * Round-11 lesson: a `persist()`ed (or `localCheckpoint`ed) frame is
    * not a durable index artifact over a LIVE corpus directory —
    * persist's lineage can silently re-derive from the current directory
    * (observed under the foreachBatch-cloned session: the new-vector
    * anti-join saw everything as indexed), and localCheckpoint is
    * non-fault-tolerant (one executor loss kills serving) with no prompt
    * release path. Writing the codes and reading them back gives exactly
    * the production contract the scale note below promises: the index IS
    * a table — immutable listing (a later corpus append cannot leak in),
    * recomputable after executor loss, appendable in place (the no-drift
    * path is literally a file append), and released by deleting the
    * superseded directory at swap time. */
  private def snapshotDir(): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_pq_index",
      java.util.UUID.randomUUID.toString)
    p.toString
  }

  /** Recursive delete of a superseded snapshot — the prompt-release half
    * of the swap (failure-safe: missing paths are a no-op). */
  def release(idx: PqIndex): Unit = deleteDir(idx.codesPath)

  private[graft] def deleteDir(path: String): Unit = {
    val root = new java.io.File(path)
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rec)
      f.delete(); ()
    }
    if (root.exists()) rec(root)
  }

  /** Full build: fit, encode, WRITE the code table, read it back as the
    * immutable serving frame, baseline the drift statistic. A write
    * failure (corpus mid-write) cleans its partial directory before
    * rethrowing into the caller's failure-isolation Try. */
  def build(corpus: DataFrame,
      m: Int = Similarity.PqM, ks: Int = Similarity.PqKs): PqIndex = {
    val books = Similarity.fitPqFrom(corpus, m, ks)
    val path = snapshotDir()
    try Similarity.assignCodes(corpus, books, Seq("vec_id"))
      .write.mode("overwrite").parquet(path)
    catch { case e: Throwable => deleteDir(path); throw e }
    val codes = corpus.sparkSession.read.parquet(path)
    PqIndex(books, codes, path, corpus, quantizationError(corpus, books), 0)
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
    * encode APPENDED INTO the index directory (work ∝ batch — the
    * production `INSERT INTO` shape, literally). Drift → full
    * deterministic re-fit over `grown` into a fresh directory, the
    * superseded one deleted only after its replacement is live. */
  def append(idx: PqIndex, batch: DataFrame, driftFactor: Double = 1.5): PqIndex =
    appendWith(idx, batch, idx.corpus.unionByName(batch), driftFactor)

  /** [[append]] with the grown corpus supplied explicitly — the streaming
    * refresh path already holds a fresh read of the live table and must
    * not union a stale file-listing snapshot. */
  def appendWith(idx: PqIndex, batch: DataFrame, grown: DataFrame,
      driftFactor: Double = 1.5): PqIndex = {
    // materialize the incoming batch ONCE (bounded, transient): `batch`
    // may be a lazy anti-join over the LIVE corpus directory, and without
    // this the emptiness check, the drift gate, and the encode would each
    // re-evaluate it — three scans, and files landing between the gate
    // and the encode would enter the index un-measured
    val snap = batch.localCheckpoint(true)
    if (snap.isEmpty) return idx // nothing new (avg over zero rows is null)
    val batchErr = quantizationError(snap, idx.books)
    if (batchErr > driftFactor * idx.baseErr) {
      val fresh = build(grown)
      release(idx)
      fresh
    } else {
      Similarity.assignCodes(snap, idx.books, Seq("vec_id"))
        .write.mode("append").parquet(idx.codesPath)
      idx.copy(
        codes = idx.codes.sparkSession.read.parquet(idx.codesPath),
        corpus = grown,
        appends = idx.appends + 1)
    }
  }

  /** Serve a query batch (`q_id`, `q_v`) — the shared ADC scan+rank tail,
    * so results are definitionally comparable with the batch PQ family. */
  def topK(idx: PqIndex, queries: DataFrame, k: Int = 10): DataFrame =
    Similarity.adcTopKAgainst(idx.codes, queries, idx.books, k)
}
