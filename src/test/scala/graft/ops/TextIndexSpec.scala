package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents").select("doc_id", "text")

  test("build + append serves exactly the one-shot full-corpus BM25 ranking") {
    val base = TextIndex.build(docs.filter(col("doc_id") % 10 =!= 0))
    val grown = TextIndex.append(base, docs.filter(col("doc_id") % 10 === 0))
    val queries = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
    val served = TextIndex.topK(grown, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val oneShot = TextAnalysis.bm25TopKFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    TextIndex.release(grown)
    assert(served.nonEmpty && served.toSeq == oneShot.toSeq,
      "incremental maintenance must be exact: indexed serve == one-shot")
  }

  test("append touches only the batch: historical postings rows are byte-stable") {
    val base = TextIndex.build(docs.filter(col("doc_id") % 10 =!= 0))
    val before = base.tf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val grown = TextIndex.append(base, docs.filter(col("doc_id") % 10 === 0))
    val after = grown.tf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batchIds = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(before.subsetOf(after), "append must not rewrite history")
    assert((after -- before).forall(p => batchIds.contains(p._1)),
      "new postings rows belong to the batch alone")
    TextIndex.release(grown)
  }

  test("remove: erasure is EXACT — serve equals a from-scratch build on the remaining corpus") {
    import spark.implicits._
    val full = TextIndex.build(docs)
    val oldPath = full.tfPath
    val goneIds = docs.filter(col("doc_id") % 7 === 0)
      .select("doc_id").as[Long].collect().toSet
    val pruned = TextIndex.remove(full, goneIds.toSeq.toDF("doc_id"))
    val queries = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("q_id"), col("text"))
    val served = TextIndex.topK(pruned, queries).collect().map(_.toString).toSeq
    assert(served.nonEmpty)
    // the whole point vs the PQ side: df/N/avgdl re-derive from postings,
    // so erasure is exact — identical rows to never having indexed them
    val fresh = TextIndex.build(docs.filter(col("doc_id") % 7 =!= 0))
    val fromScratch = TextIndex.topK(fresh, queries).collect().map(_.toString).toSeq
    assert(served == fromScratch,
      "post-erasure serve diverged from a from-scratch build on the remaining corpus")
    // the superseded snapshot (holding the erased docs' term stats) is gone
    assert(!new java.io.File(oldPath).exists(), "old postings bytes still on disk")
    assert(pruned.tf.filter(col("doc_id").isin(goneIds.toSeq: _*)).isEmpty)
    // append after erasure cannot resurrect
    val reAppended = TextIndex.append(pruned,
      docs.filter(col("doc_id") % 10 === 3 && col("doc_id") % 7 =!= 0).limit(0)
        .unionByName(docs.limit(0))) // empty batch: no-op path
    assert(reAppended.tf.filter(col("doc_id").isin(goneIds.toSeq: _*)).isEmpty)
    TextIndex.release(fresh); TextIndex.release(reAppended)
  }

  test("compaction preserves every row and reduces the snapshot to the byte target") {
    var idx = TextIndex.build(docs.filter(col("doc_id") % 4 === 0))
    for (r <- 1 to 3)
      idx = TextIndex.append(idx, docs.filter(col("doc_id") % 4 === r),
        compactEvery = 0) // hold compaction so the file pileup is visible
    val rows = idx.tf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val filesBefore = Option(new java.io.File(idx.tfPath).listFiles())
      .toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val compacted = TextIndex.compact(idx)
    val filesAfter = Option(new java.io.File(compacted.tfPath).listFiles())
      .toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val rowsAfter = compacted.tf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rowsAfter == rows, "compaction must not change the postings")
    assert(filesAfter < filesBefore,
      s"compaction must merge files: $filesBefore -> $filesAfter")
    assert(compacted.appends == 0)
    TextIndex.release(compacted)
  }

  test("a failed compaction serves the GROWN snapshot, never a stale listing") {
    // the post-promote failure mode: compact throws AFTER the batch's
    // postings were promoted into tfPath. The old contract propagated the
    // exception, so callers kept the pre-append index whose frame lists
    // only the old files — their next refresh's anti-join would re-select
    // the promoted doc_ids and append them AGAIN (duplicate postings,
    // inflated tf/df). The contract now: append returns the grown,
    // uncompacted index.
    val base = TextIndex.build(docs.filter(col("doc_id") % 10 =!= 0))
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val grown = TextIndex.appendWith(base, batch, compactEvery = 1,
      _ => throw new RuntimeException("simulated compaction write failure"))
    val servedIds = grown.tf.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(batchIds.subsetOf(servedIds),
      "served frame must list the promoted batch despite the failed compact")
    // the refresh anti-join over the returned frame selects NOTHING new
    val fresh = docs.join(grown.tf.select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
    assert(fresh.isEmpty, "anti-join must see every promoted doc_id")
    assert(grown.appends == 1, "failed compact leaves the append counter for retry")
    TextIndex.release(grown)
  }

  test("a failed append leaves no committed orphans in the serving directory") {
    val base = TextIndex.build(docs.filter(col("doc_id") % 10 =!= 0))
    val files = Option(new java.io.File(base.tfPath).listFiles())
      .toSeq.flatten.map(_.getName).toSet
    import spark.implicits._
    val poison = Seq((1L, "x")).toDF("doc_id", "text")
      .withColumn("text",
        udf((s: String) => { throw new RuntimeException("boom"); s })
          .apply(col("text")))
    intercept[Throwable] { TextIndex.append(base, poison) }
    val filesAfter = Option(new java.io.File(base.tfPath).listFiles())
      .toSeq.flatten.map(_.getName).toSet
    assert(filesAfter == files, "failed append must not mutate the snapshot")
    assert(Option(new java.io.File(base.tfPath).getParentFile.listFiles())
      .toSeq.flatten.forall(f => !f.getName.contains("staging")),
      "staging directories are cleaned on failure")
    TextIndex.release(base)
  }
}
