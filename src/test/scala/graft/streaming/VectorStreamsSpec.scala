package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Similarity, Tables}

/** Stream-static ANN serving parity: micro-batches of query vectors through
  * [[VectorStreams.adcServe]] must reproduce the batch `pq_adc_topk` result
  * for the same query ids — same fitted codebooks, same coded corpus, same
  * scoring tail (shared code, but the spec pins the composition end to
  * end: LUT build under foreachBatch, broadcast, sink write). Two batches
  * prove the static index survives across micro-batches.
  */
class VectorStreamsSpec extends SparkSuite {
  import spark.implicits._

  /** The termination listener fires asynchronously after `stop()` returns —
    * poll until the serve's persisted index frame is actually unpersisted
    * (or fail after ~10 s). */
  private def awaitUnpersisted(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      s"$what still persisted after stream stop — termination release never fired")
  }

  test("micro-batched ADC serving equals the batch PQ scan per query id") {
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")

    val corpus = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = corpus.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(3)
    assert(qIds.length == 3, "need three query vectors in the smoke corpus")
    val qVecs = corpus.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")

    // batch 0: two queries; batch 1: the third — the coded corpus persists
    // across both micro-batches
    mem.addData((qIds(0), qVecs(qIds(0))), (qIds(1), qVecs(qIds(1))))
    val q = VectorStreams.adcServe(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData((qIds(2), qVecs(qIds(2))))
    q.processAllAvailable()
    q.stop()

    val served = Sinks.readSink(spark, out)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val batch = Similarity.pqAdcTopK(spark, dir)
      .filter(col("q_id").isin(qIds: _*))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served == batch,
      s"stream-served ADC diverged from batch: ${(served diff batch).take(5)} / ${(batch diff served).take(5)}")
  }

  test("micro-batched FILTERED ADC serving equals the batch filtered serve per query id") {
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-fserve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")

    // the batch serve's own query set (vec_id ≤ ServeBatchMaxId), streamed
    // in TWO micro-batches — per-query independence means the union of the
    // per-batch outputs must equal the batch result row-for-row, probes,
    // label cut, budget and all
    val served = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") <= graft.ops.TextAnalysis.ServeBatchMaxId)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    assert(served.length >= 4, "need a few served queries in the smoke corpus")
    val (b1, b2) = served.splitAt(served.length / 2)

    val mem = MemoryStream[(Long, Seq[Double], Int)](spark)
    val stream = mem.toDF().toDF("vec_id", "v", "label")
    mem.addData(b1.toIndexedSeq)
    val q = VectorStreams.filteredAdcServe(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // teardown FIRST, before the batch comparison below re-persists the
    // same logical plan (the cache manager keys by plan, so a later
    // identical build would mask a leak): stopping the stream must release
    // the persisted cell assignment — without the termination hook it
    // leaks for the session lifetime
    awaitUnpersisted(VectorStreams.lastFilteredIndex.assigned,
      "filtered serve's cell assignment")

    val got = Sinks.readSink(spark, out)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val batch = Similarity.ivfPqFilteredTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == batch,
      s"stream-served filtered ADC diverged from batch: ${(got diff batch).take(5)} / ${(batch diff got).take(5)}")
    assert(got.nonEmpty, "filtered serve produced no rows — spec is vacuous")
  }

  test("micro-batched MaxSim serving equals the batch late-interaction serve per query doc") {
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-maxsim-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    import graft.ops.MaxSim

    // the batch query docs, streamed as (doc, chunk, v) rows in TWO
    // micro-batches split on WHOLE docs (the serving contract: a doc's
    // chunks arrive together)
    val rows = Tables(spark, dir, "embeddings")
      .filter(expr(s"vec_id div ${MaxSim.MaxSimFan}") <= MaxSim.queryMaxDoc)
      .select(expr(s"vec_id div ${MaxSim.MaxSimFan}").as("doc"),
        (col("vec_id") % MaxSim.MaxSimFan).as("chunk"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Long, Seq[Double])].collect()
    val docs = rows.map(_._1).distinct.sorted
    val (d1, d2) = docs.splitAt(docs.length / 2)
    val (b1, b2) = (rows.filter(r => d1.contains(r._1)), rows.filter(r => d2.contains(r._1)))

    val mem = MemoryStream[(Long, Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("doc", "chunk", "v")
    mem.addData(b1.toIndexedSeq)
    val q = VectorStreams.maxSimServe(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // teardown FIRST (before the batch comparison re-persists the same
    // plan): stopping the stream must release the persisted chunk-LSH
    // index — the filtered serve's termination-hook contract
    awaitUnpersisted(VectorStreams.lastMaxSimIndex.banded,
      "MaxSim serve's banded index")

    val got = Sinks.readSink(spark, out)
      .select("q_doc", "d_doc", "rank", "maxsim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val batch = MaxSim.maxSimTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == batch,
      s"stream-served MaxSim diverged from batch: ${(got diff batch).take(5)} / ${(batch diff got).take(5)}")
    assert(got.nonEmpty, "MaxSim serve produced no rows — spec is vacuous")
  }

  /** Live-index serving: the corpus GROWS between micro-batches, and the
    * `refreshEvery` hook must re-fit + re-persist + swap without a stream
    * restart. The appended vectors are exact twins of the originals in a
    * shifted id range, so the post-swap query's own twin tops its ADC
    * ranking — visible proof the batch scored against the NEW index — and
    * the whole post-swap batch must equal batch scoring re-derived from
    * the updated corpus (fitPq is deterministic, so both fits agree).
    */
  test("refreshEvery swaps in a re-built index mid-stream") {
    val src = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-refresh").toFile
    val dir = s"$root/corpus"
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    val Shift = 1000000L

    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    orig.write.parquet(s"$dir/embeddings.parquet")

    val corpus0 = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = corpus0.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(2)
    val qVecs = corpus0.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")

    // batch 0 serves the seed corpus
    mem.addData((qIds(0), qVecs(qIds(0))))
    val q = VectorStreams.adcServe(spark, dir, stream, out, ckpt,
      k = 10, refreshEvery = 1L)
    q.processAllAvailable()
    // corpus grows: every vector gains an exact twin at vec_id + Shift
    orig.withColumn("vec_id", col("vec_id") + Shift)
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    // batch 1 crosses the refresh boundary → rebuild sees the twins
    mem.addData((qIds(1), qVecs(qIds(1))))
    q.processAllAvailable()
    q.stop()

    val afterSwap = Sinks.readSink(spark, out)
      .filter(col("batch_id") === 1)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterSwap.exists(_._2 == qIds(1) + Shift),
      s"post-swap top-k never surfaced the query's appended twin ${qIds(1) + Shift} — stale index?")

    // fitPqFrom on the UPDATED corpus — the session-cached fitPq would
    // return the seed-corpus books and mask a refresh that fails to re-fit
    val corpus2 = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val books2 = Similarity.fitPqFrom(corpus2, Similarity.PqM, Similarity.PqKs)
    val codes2 = Similarity.assignCodes(corpus2, books2, Seq("vec_id"))
    val queries2 = corpus0.filter(col("vec_id") === qIds(1))
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val expected = Similarity.adcTopKAgainst(codes2, queries2, books2, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterSwap == expected,
      s"post-swap serving diverged from batch scoring on the updated corpus: " +
        s"${(afterSwap diff expected).take(5)} / ${(expected diff afterSwap).take(5)}")
  }

  test("incremental refresh erases upstream-deleted vectors from the serving index") {
    val src = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-erase").toFile
    val dir = s"$root/corpus"
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")

    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    orig.write.parquet(s"$dir/embeddings.parquet")
    val seed = Tables(spark, src, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = seed.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(2)
    val qVecs = seed.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap
    // the ids to erase: query 1's CURRENT top hits — if erasure fails,
    // they will provably reappear in the post-refresh serve
    val books0 = Similarity.fitPqFrom(seed, Similarity.PqM, Similarity.PqKs)
    val codes0 = Similarity.assignCodes(seed, books0, Seq("vec_id"))
    val q1 = seed.filter(col("vec_id") === qIds(1))
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val goneIds = Similarity.adcTopKAgainst(codes0, q1, books0, 3)
      .select("n_id").as[Long].collect().toSet
    assert(goneIds.nonEmpty)

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")
    mem.addData((qIds(0), qVecs(qIds(0))))
    val q = VectorStreams.adcServeIncremental(spark, dir, stream, out, ckpt,
      k = 10, refreshEvery = 1L)
    q.processAllAvailable()
    // upstream erasure: rewrite the corpus dir minus the erased ids (the
    // cascade's delete reaching the table the index mirrors)
    val shrunk = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(!col("vec_id").isin(goneIds.toSeq: _*))
      .localCheckpoint(true)
    shrunk.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    mem.addData((qIds(1), qVecs(qIds(1))))
    q.processAllAvailable()
    q.stop()

    val afterErase = Sinks.readSink(spark, out)
      .filter(col("batch_id") === 1)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterErase.nonEmpty)
    assert(afterErase.forall(r => !goneIds.contains(r._2)),
      s"an erased vector is still served: ${afterErase.filter(r => goneIds.contains(r._2))}")
    // frozen-books parity with the shrunken corpus (no drift, no append —
    // erasure must not move the model)
    val remaining = seed.filter(!col("vec_id").isin(goneIds.toSeq: _*))
    val expected = Similarity.adcTopKAgainst(
      Similarity.assignCodes(remaining, books0, Seq("vec_id")), q1, books0, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterErase == expected,
      s"post-erasure serving diverged: ${(afterErase diff expected).take(5)} / ${(expected diff afterErase).take(5)}")
  }

  /** Incremental live index ([[VectorStreams.adcServeIncremental]]): the
    * corpus grows with same-distribution twins (the NO-drift path), and the
    * post-refresh batch must equal scoring the grown corpus under the
    * ORIGINAL frozen codebooks — i.e. the refresh encoded only the new
    * vectors and never re-fitted (a full re-fit would have sampled the
    * grown id space and produced different books). The twin membership
    * check additionally proves the new vectors are actually served.
    */
  test("incremental refresh serves a grown corpus without a full re-fit") {
    val src = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-incr").toFile
    val dir = s"$root/corpus"
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    val Shift = 1000000L

    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    orig.write.parquet(s"$dir/embeddings.parquet")
    val seed = Tables(spark, src, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = seed.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(2)
    val qVecs = seed.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")

    mem.addData((qIds(0), qVecs(qIds(0))))
    val q = VectorStreams.adcServeIncremental(spark, dir, stream, out, ckpt,
      k = 10, refreshEvery = 1L)
    q.processAllAvailable()
    // corpus grows: exact twins in a disjoint id range (no drift)
    orig.withColumn("vec_id", col("vec_id") + Shift)
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    mem.addData((qIds(1), qVecs(qIds(1))))
    q.processAllAvailable()
    q.stop()

    val afterRefresh = Sinks.readSink(spark, out)
      .filter(col("batch_id") === 1)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterRefresh.exists(_._2 == qIds(1) + Shift),
      s"post-refresh top-k never surfaced the appended twin ${qIds(1) + Shift} — index did not grow")

    // frozen-books parity: the grown corpus encoded under the SEED fit
    val books0 = Similarity.fitPqFrom(seed, Similarity.PqM, Similarity.PqKs)
    val grown = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val queries1 = seed.filter(col("vec_id") === qIds(1))
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val expected = Similarity.adcTopKAgainst(
        Similarity.assignCodes(grown, books0, Seq("vec_id")), queries1, books0, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterRefresh == expected,
      s"incremental serving diverged from frozen-books scoring of the grown corpus: " +
        s"${(afterRefresh diff expected).take(5)} / ${(expected diff afterRefresh).take(5)}")
  }

  /** Incremental serving, DRIFT path: the corpus grows with far-shifted
    * rescaled vectors whose quantization error under the frozen books
    * blows past the drift gate — the refresh must run the full
    * deterministic re-fit, and the post-refresh batch must equal batch
    * scoring with books re-fitted on the grown corpus (NOT the frozen
    * seed books).
    */
  test("incremental refresh re-fits when the appended batch drifts") {
    val src = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-drift").toFile
    val dir = s"$root/corpus"
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    val Shift = 1000000L

    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    orig.write.parquet(s"$dir/embeddings.parquet")
    val seed = Tables(spark, src, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = seed.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(2)
    val qVecs = seed.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")

    mem.addData((qIds(0), qVecs(qIds(0))))
    val q = VectorStreams.adcServeIncremental(spark, dir, stream, out, ckpt,
      k = 10, refreshEvery = 1L)
    q.processAllAvailable()
    // drifted growth: rescaled + offset vectors, far outside the fitted
    // codeword range
    orig.select((col("vec_id") + Shift).as("vec_id"),
        transform(col("embedding"), x => x * lit(3.0f) + lit(7.0f)).as("embedding"))
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    mem.addData((qIds(1), qVecs(qIds(1))))
    q.processAllAvailable()
    q.stop()

    val afterRefresh = Sinks.readSink(spark, out)
      .filter(col("batch_id") === 1)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    // parity with a full re-fit over the grown corpus (deterministic fit)
    val grown = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val booksG = Similarity.fitPqFrom(grown, Similarity.PqM, Similarity.PqKs)
    val queries1 = seed.filter(col("vec_id") === qIds(1))
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val expected = Similarity.adcTopKAgainst(
        Similarity.assignCodes(grown, booksG, Seq("vec_id")), queries1, booksG, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterRefresh == expected,
      s"drift refresh did not serve the re-fitted index: " +
        s"${(afterRefresh diff expected).take(5)} / ${(expected diff afterRefresh).take(5)}")
  }

  /** Kill/restart with a REAL file source + checkpoint (the path the
    * MemoryStream specs can't reach): the serving query dies between
    * micro-batches, the corpus grows while it is down, and the restarted
    * query must (a) rebuild its index from the live corpus — restart IS
    * an index refresh, by construction of `buildIndex` — and (b) keep the
    * sink exactly-once: the pre-kill batch's rows re-read unchanged, the
    * post-restart batch lands once under the next batch_id.
    */
  test("kill/restart rebuilds the index from the live corpus; sink stays exactly-once") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
    val src = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-restart").toFile
    val dir = s"$root/corpus"
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(in).mkdirs()
    val Shift = 1000000L

    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    orig.write.parquet(s"$dir/embeddings.parquet")
    val corpus0 = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = corpus0.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(2)
    val qVecs = corpus0.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    def startQuery() = VectorStreams.adcServe(
      spark, dir, spark.readStream.schema(schema).parquet(in), out, ckpt)

    // run 1: one query vector, served against the seed corpus, then die
    Seq((qIds(0), qVecs(qIds(0)))).toDF("vec_id", "v")
      .write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val batch0 = Sinks.readSink(spark, out)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    // corpus grows while the query is DOWN
    orig.withColumn("vec_id", col("vec_id") + Shift)
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    // run 2: second query — the restarted query's index must see the twins
    Seq((qIds(1), qVecs(qIds(1)))).toDF("vec_id", "v")
      .write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val all = Sinks.readSink(spark, out)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val afterRestart = all.filter(_._1 == qIds(1))
    // exactly-once: batch 0's rows are still there, bit-identical, once
    assert(all.filter(_._1 == qIds(0)) == batch0,
      "pre-kill batch changed or duplicated across the restart")
    // the rebuilt index serves the grown corpus: the new query's appended
    // twin (identical vector ⇒ top ADC score) is in its top-k
    assert(afterRestart.exists(_._2 == qIds(1) + Shift),
      s"post-restart top-k never surfaced the appended twin ${qIds(1) + Shift} — stale index across restart?")
  }
}
