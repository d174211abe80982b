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
}
