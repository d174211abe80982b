package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental PQ-index maintenance ([[IncrementalIndex]]): a grown corpus
  * is served WITHOUT a full re-fit (frozen-books encode of the new batch
  * only), drift triggers a re-fit bit-identical to a from-scratch build on
  * the grown corpus, and both paths serve through the shared ADC tail.
  */
class IncrementalIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val Shift = 1000000L

  private def corpus0 = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  private def queriesOf(c: org.apache.spark.sql.DataFrame) =
    c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))

  test("no-drift append: books frozen, codes equal encode-all, twin served — no re-fit ran") {
    val idx0 = IncrementalIndex.build(corpus0)
    val books0 = idx0.books
    // exact twins in a disjoint id range: same distribution, so the batch's
    // quantization error equals the baseline exactly — the no-drift path
    val twins = corpus0.select((col("vec_id") + Shift).as("vec_id"), col("v"))
    val idx1 = IncrementalIndex.append(idx0, twins)

    assert(idx1.books eq books0, "no-drift append must keep the frozen codebooks")
    assert(idx1.appends == 1 && idx1.baseErr == idx0.baseErr)

    // code-table parity with encoding the whole grown corpus under the
    // same frozen books — the union took the batch-sized shortcut to the
    // identical artifact
    val grown = corpus0.unionByName(twins)
    val expectCodes = Similarity.assignCodes(grown, books0, Seq("vec_id"))
      .collect().map(_.toSeq).toSet
    assert(idx1.codes.collect().map(_.toSeq).toSet == expectCodes)

    // served proof: each query's appended exact twin carries the query's own
    // codes — the maximal ADC score — so it must appear in the query's
    // top-k of the grown index (rank 1 is not guaranteed: equal rounded
    // scores tie-break by id, and the twin ids are the largest)
    val served = IncrementalIndex.topK(idx1, queriesOf(corpus0), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val queries = served.map(_._1).distinct
    val withTwin = queries.count(q => served.contains((q, q + Shift)))
    assert(queries.nonEmpty && withTwin == queries.length,
      s"only $withTwin of ${queries.length} queries surfaced their appended twin in the top-10")
    IncrementalIndex.release(idx1)
  }

  test("remove: erased ids leave the serve AND the disk; later maintenance cannot resurrect them") {
    val idx0 = IncrementalIndex.build(corpus0)
    val oldPath = idx0.codesPath
    import spark.implicits._
    // erase every 7th vector (includes some of the %50 query set's top hits)
    val goneIds = corpus0.filter(col("vec_id") % 7 === 0)
      .select("vec_id").as[Long].collect().toSet
    val idx1 = IncrementalIndex.remove(idx0, goneIds.toSeq.toDF("vec_id"))

    // serving: no erased id ever appears; results equal serving the
    // filtered code table under the SAME frozen books (erasure must not
    // move the model)
    assert(idx1.books eq idx0.books)
    val served = IncrementalIndex.topK(idx1, queriesOf(corpus0), k = 10).collect()
    assert(served.nonEmpty)
    assert(served.forall(r => !goneIds.contains(r.getLong(1))),
      "an erased vector was served")
    val remaining = corpus0.join(goneIds.toSeq.toDF("vec_id"), Seq("vec_id"), "left_anti")
    val expect = Similarity.adcTopKAgainst(
      Similarity.assignCodes(remaining, idx0.books, Seq("vec_id")),
      queriesOf(corpus0), idx0.books, 10).collect().map(_.toString).toSeq
    assert(served.map(_.toString).toSeq == expect,
      "post-erasure serve diverged from an index that never held the erased rows")

    // Art. 17: the superseded snapshot (holding the erased codes) is GONE
    assert(!new java.io.File(oldPath).exists(), "old snapshot bytes still on disk")
    assert(idx1.codes.filter(col("vec_id").isin(goneIds.toSeq: _*)).isEmpty)

    // a later frozen-books append cannot resurrect: append fresh twins,
    // erased ids stay absent from codes and serve
    val twins = remaining.select((col("vec_id") + Shift).as("vec_id"), col("v"))
    val idx2 = IncrementalIndex.append(idx1, twins)
    assert(idx2.codes.filter(col("vec_id").isin(goneIds.toSeq: _*)).isEmpty)
    // and the narrowed corpus means even a full re-fit path rebuilds
    // WITHOUT the erased rows
    assert(idx2.corpus.filter(col("vec_id").isin(goneIds.toSeq: _*)).isEmpty)
    // removing ids that are not indexed is a row-level no-op (count taken
    // BEFORE the remove — its swap releases idx2's directory)
    val idx2Count = idx2.codes.count()
    val idx3 = IncrementalIndex.remove(idx2, Seq(999999999L).toDF("vec_id"))
    assert(idx3.codes.count() == idx2Count)
    IncrementalIndex.release(idx3)
  }

  test("drift append: re-fit runs and is bit-identical to a from-scratch build on the grown corpus") {
    val idx0 = IncrementalIndex.build(corpus0)
    // a far-shifted, rescaled batch: far outside the fitted codeword range
    val drifted = corpus0.select((col("vec_id") + Shift).as("vec_id"),
      transform(col("v"), x => x * 3.0 + 7.0).as("v"))
    val grown = corpus0.unionByName(drifted)

    // precondition: the drift statistic actually fires
    val batchErr = IncrementalIndex.quantizationError(drifted, idx0.books)
    assert(batchErr > 1.5 * idx0.baseErr,
      s"fixture not drifted enough: $batchErr vs base ${idx0.baseErr}")

    val idx1 = IncrementalIndex.append(idx0, drifted)
    assert(!(idx1.books eq idx0.books) && idx1.appends == 0,
      "drift must trigger a re-fit")
    val rebuilt = IncrementalIndex.build(grown)
    assert(idx1.books.map(_.map(_.toSeq).toSeq).toSeq ==
      rebuilt.books.map(_.map(_.toSeq).toSeq).toSeq,
      "drift re-fit must equal the deterministic from-scratch fit")

    val servedInc = IncrementalIndex.topK(idx1, queriesOf(corpus0), k = 10)
      .collect().map(_.toSeq).toSet
    val servedFull = IncrementalIndex.topK(rebuilt, queriesOf(corpus0), k = 10)
      .collect().map(_.toSeq).toSet
    assert(servedInc == servedFull,
      "drift path must serve identically to the full re-fit path")
    IncrementalIndex.release(idx1); IncrementalIndex.release(rebuilt)
  }

  test("three chained no-drift appends equal one encode-all (union-of-union lineage path)") {
    val idx0 = IncrementalIndex.build(corpus0)
    val books0 = idx0.books
    val batches = (1 to 3).map(i =>
      corpus0.select((col("vec_id") + i * Shift).as("vec_id"), col("v")))
    val idxN = batches.foldLeft(idx0)((idx, b) => IncrementalIndex.append(idx, b))
    assert((idxN.books eq books0) && idxN.appends == 3,
      "chained same-distribution appends must never re-fit")
    val grown = batches.foldLeft(corpus0)(_ unionByName _)
    val expect = Similarity.assignCodes(grown, books0, Seq("vec_id"))
      .collect().map(_.toSeq).toSet
    assert(idxN.codes.collect().map(_.toSeq).toSet == expect,
      "chained unions diverged from the one-shot encode-all")
    assert(idxN.codes.count() == 4 * corpus0.count())
    IncrementalIndex.release(idxN)
  }

  test("the code table is a true snapshot: growing the source directory cannot change it") {
    // regression pin for the round-11 live-index bug: a persist()ed code
    // table still carries the source scan in its lineage and can silently
    // re-derive from the CURRENT directory; the snapshot contract says the
    // built index NEVER sees a later append
    val root = java.nio.file.Files.createTempDirectory("graft-idx-snap").toFile
    val dirT = root.getAbsolutePath
    val orig = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    orig.write.parquet(s"$dirT/embeddings.parquet")
    val live = Tables(spark, dirT, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val idx = IncrementalIndex.build(live)
    val n0 = idx.codes.count()
    orig.withColumn("vec_id", col("vec_id") + Shift)
      .write.mode("append").parquet(s"$dirT/embeddings.parquet")
    assert(idx.codes.count() == n0,
      "code table re-derived from the grown directory — the index is not a snapshot")
    assert(idx.codes.filter(col("vec_id") >= Shift).count() == 0,
      "appended ids leaked into the built index")
    IncrementalIndex.release(idx)
  }

  test("appends-gated compaction: file count drops back, appends reset, rows unchanged, old dir released") {
    def partFiles(p: String) = Option(new java.io.File(p).listFiles()).toSeq.flatten
      .filter(f => f.getName.contains("part-") && f.getName.endsWith(".parquet"))
    val idx0 = IncrementalIndex.build(corpus0)
    val books0 = idx0.books
    val path0 = idx0.codesPath
    val buildFiles = partFiles(path0).length
    val batches = (1 to 3).map(i =>
      corpus0.select((col("vec_id") + i * Shift).as("vec_id"), col("v")))
    // compactEvery=3: the first two appends accumulate files in place
    val idx2 = batches.take(2).foldLeft(idx0)(
      (idx, b) => IncrementalIndex.append(idx, b, compactEvery = 3))
    assert(idx2.appends == 2 && idx2.codesPath == path0)
    val preCompact = partFiles(path0).length
    assert(preCompact > buildFiles,
      s"appends did not accumulate files ($buildFiles -> $preCompact)")
    // the third crosses the gate: fresh directory, bounded file count,
    // counter reset, frozen books, identical rows
    val idx3 = IncrementalIndex.append(idx2, batches(2), compactEvery = 3)
    assert(idx3.appends == 0, "compaction must reset the appends counter")
    assert(idx3.codesPath != path0, "compaction must swap to a fresh directory")
    assert(!new java.io.File(path0).exists, "superseded directory not released")
    assert(idx3.books eq books0, "compaction must not touch the codebooks")
    val postCompact = partFiles(idx3.codesPath).length
    assert(postCompact < preCompact,
      s"compaction did not shrink the file count ($preCompact -> $postCompact)")
    val grown = batches.foldLeft(corpus0)(_ unionByName _)
    val expect = Similarity.assignCodes(grown, books0, Seq("vec_id"))
      .collect().map(_.toSeq).toSet
    assert(idx3.codes.collect().map(_.toSeq).toSet == expect,
      "compaction changed the served code table")
    IncrementalIndex.release(idx3)
  }

  test("staged append leaves no staging residue in the serving directory") {
    val idx0 = IncrementalIndex.build(corpus0)
    val twins = corpus0.select((col("vec_id") + Shift).as("vec_id"), col("v"))
    val idx1 = IncrementalIndex.append(idx0, twins)
    val names = Option(new java.io.File(idx1.codesPath).listFiles())
      .toSeq.flatten.map(_.getName)
    assert(!names.exists(_.contains("staging")),
      s"staging artifacts leaked into the serving dir: $names")
    // and no sibling staging directory survives a successful promote
    val parent = new java.io.File(idx1.codesPath).getParentFile
    val strays = Option(parent.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(new java.io.File(idx1.codesPath).getName + ".staging"))
    assert(strays.isEmpty, s"staging directories left behind: $strays")
    IncrementalIndex.release(idx1)
  }

  test("empty append is a no-op; quantization error is non-negative") {
    val idx0 = IncrementalIndex.build(corpus0)
    assert(idx0.baseErr >= 0.0)
    val idx1 = IncrementalIndex.append(idx0, corpus0.filter(lit(false)))
    assert((idx1.books eq idx0.books) && (idx1.codes eq idx0.codes) && idx1.appends == 0)
    IncrementalIndex.release(idx0)
  }
}
