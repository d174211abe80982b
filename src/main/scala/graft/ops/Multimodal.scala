package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, plus the
  * operations a 100-TB media pipeline runs over them — decode/feature-extract
  * (stubbed codec, real distributed plumbing), frame sampling, and per-type
  * stats.
  *
  * The testdata has no real media files (and this container has no
  * image/audio codecs), so [[mediaTable]] derives a deterministic synthetic
  * media table from `documents`: payload = UTF-8 bytes of `text`, modality
  * assigned round-robin by doc_id. What is REAL and load-bearing here is the
  * Spark side: the schema contract (`payload binary, meta struct`), the
  * batched per-partition execution shape of [[extractFeatures]] (the same
  * iterator-of-batches contract a Pandas-UDF/`mapInPandas` decode has in
  * PySpark), and the pure-column [[frameSample]]. A real deployment swaps
  * [[FeatureCodec.decode]] for an actual codec and nothing else moves.
  */
object Multimodal {

  val Modalities = Seq("image/png", "audio/wav", "video/mp4")
  val FrameBytes = 64 // synthetic fixed-size "frame" within a payload

  /** Media table: one row per document — `doc_id, payload (binary), meta
    * (mime, n_bytes)`. Deterministic; both engines can derive it identically.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val mime = element_at(
      array(Modalities.map(lit): _*), (col("doc_id") % 3).cast("int") + 1)
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        mime.as("mime"),
        length(col("text").cast("binary")).as("n_bytes")).as("meta"))
  }

  /** Per-modality stats — the kind of scan a pipeline runs before deciding
    * how to shard a decode job. One narrow projection + tiny hash agg.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("meta.mime").as("mime"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).cast("long").as("total_bytes"),
        round(avg(col("meta.n_bytes")), 2).as("avg_bytes"))
      .orderBy("mime")

  val mediaStatsSql: String =
    """SELECT mime, count(*) AS n,
      |  sum(n_bytes)::bigint AS total_bytes,
      |  round(avg(n_bytes), 2) AS avg_bytes
      |FROM (
      |  SELECT CASE (doc_id % 3)::int
      |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |      ELSE 'video/mp4' END AS mime,
      |    octet_length(text::BLOB) AS n_bytes
      |  FROM documents)
      |GROUP BY mime
      |ORDER BY mime""".stripMargin

  /** Frame sampling: every k-th fixed-size slice of the payload, as a pure
    * column expression (binary `substring` over a generated index array) —
    * no UDF, codegen-friendly, and the generated rows carry only the frame,
    * not the whole payload.
    */
  def frameSample(spark: SparkSession, dir: String, every: Int = 4): DataFrame = {
    val media = mediaTable(spark, dir)
    val nFrames = ceil(col("meta.n_bytes").cast("double") / FrameBytes).cast("int")
    media
      // zero-byte (or null) payloads have zero frames — without this filter
      // the sequence endpoint clamp would emit one phantom empty frame
      .filter(col("meta.n_bytes") > 0)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0), nFrames - 1, lit(every)))
          .as(Seq("sample_idx", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        substring(col("payload"), col("frame_idx") * FrameBytes + 1, lit(FrameBytes))
          .as("frame"))
  }

  /** [[frameSample]] reduced to driver-hashable scalars: per frame, its
    * byte length and md5 digest — the registered oracle-checked twin (raw
    * binary cells defeat the driver's pandas-side value hash, so the raw
    * variant stays rows-only while THIS query pins the slicing logic
    * cross-engine byte-for-byte).
    */
  def frameSampleDigest(spark: SparkSession, dir: String, every: Int = 4): DataFrame =
    frameSample(spark, dir, every)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** Valid because the synthetic payload is the ASCII text's UTF-8 bytes:
    * byte slicing ≙ character slicing, and DuckDB's md5 hashes the same
    * UTF-8 bytes Spark's md5-over-binary sees.
    */
  val frameSampleDigestSql: String =
    s"""WITH media AS (
       |  SELECT doc_id, text, length(text) AS n_bytes FROM documents
       |), frames AS (
       |  SELECT doc_id,
       |    unnest(range(0, (n_bytes + ${FrameBytes - 1}) // $FrameBytes, 4)) AS frame_idx,
       |    text
       |  FROM media WHERE n_bytes > 0
       |)
       |SELECT doc_id, frame_idx,
       |  length(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_bytes,
       |  md5(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_md5
       |FROM frames
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Per-payload perceptual fingerprint ([[graft.functions.DHash64]]):
    * dHash over a 65-window byte grid, one codegen'd map-side pass, no
    * shuffle. The media twin of [[Dedup.simhash]].
    */
  def mediaPhash(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        graft.functions.DHash64(col("payload")).as("phash"))
      .orderBy("doc_id")

  /** Perceptual near-dup pairs over any `(doc_id, payload)` frame: dHash
    * fingerprints through the shared segment-blocked Hamming join
    * ([[Dedup.hammingBlockedPairs]] — exhaustive for maxDist ≤ 3, refused
    * above), so the candidate join is an equi-join, never O(n²).
    */
  def mediaNearDupFrom(media: DataFrame, maxDist: Int = 3): DataFrame = {
    // Persisted like the simhash index: the self-join's two legs are
    // independent subtrees that would each recompute the fingerprint scan.
    val fp = media.select(col("doc_id"),
      graft.functions.DHash64(col("payload")).as("phash")).persist()
    Dedup.hammingBlockedPairs(fp, "phash", maxDist)
  }

  /** Registered near-dup query: the media table doubled with shifted ids
    * (planted exact duplicates, like [[Dedup.winnowNearDupPairs]]) so the
    * pair set is guaranteed non-degenerate at every SF, plus whatever
    * genuine perceptual collisions the corpus holds.
    */
  def mediaNearDup(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val media = mediaTable(spark, dir).select("doc_id", "payload")
    mediaNearDupFrom(Dedup.doubledWithShift(media), maxDist)
  }

  /** dHash re-derived in DuckDB (valid because the synthetic payload is the
    * ASCII text's UTF-8 bytes — `ord` of a one-char substring IS the byte,
    * the same caveat as the winnow/simhash oracles): byte i of n lands in
    * window `(i*65)//n`, window mean = integer floor division, missing
    * windows fill 0, bit i compares window i+1 to window i, and the 64-bit
    * fingerprint converts unsigned→signed exactly like
    * [[SimHashOracle]]'s HUGEINT mapping.
    */
  private val phashBitsRows: String =
    (0 until 64).map(i => s"($i, ${BigInt(2).pow(i)}::HUGEINT)").mkString(", ")

  private val phashCore: String =
    s"""WITH media AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |), bytes AS (
       |  SELECT doc_id, n, unnest(range(0, n)) AS i, text FROM media WHERE n > 0
       |), cellsums AS (
       |  SELECT doc_id, (i * 65) // n AS cell,
       |    sum(ord(substr(text, (i + 1)::BIGINT, 1))) AS s, count(*) AS c
       |  FROM bytes GROUP BY 1, 2
       |), grid AS (
       |  SELECT m.doc_id, g.cell, coalesce(cs.s // cs.c, 0) AS a
       |  FROM (SELECT doc_id FROM media) m
       |  CROSS JOIN (SELECT unnest(range(0, 65)) AS cell) g
       |  LEFT JOIN cellsums cs ON cs.doc_id = m.doc_id AND cs.cell = g.cell
       |), bits(bit, pw) AS (VALUES $phashBitsRows),
       |fp AS (
       |  SELECT lo.doc_id AS doc_id,
       |    coalesce(sum(CASE WHEN hi.a > lo.a THEN pw ELSE 0 END), 0)::HUGEINT AS hu
       |  FROM grid lo
       |  JOIN grid hi ON hi.doc_id = lo.doc_id AND hi.cell = lo.cell + 1
       |  JOIN bits b ON b.bit = lo.cell
       |  GROUP BY lo.doc_id
       |), sfp AS (
       |  SELECT doc_id, hu,
       |    ((CASE WHEN hu >= ${BigInt(2).pow(63)} THEN hu - ${BigInt(2).pow(64)} ELSE hu END))::BIGINT AS phash
       |  FROM fp
       |)""".stripMargin

  val mediaPhashSql: String =
    phashCore + "\nSELECT doc_id, phash FROM sfp ORDER BY doc_id"

  /** Blocking + verify mirror of [[mediaNearDup]] over the doubled corpus
    * (copies share the source text, so each fingerprint is computed once
    * and re-labeled): 16-bit segments via integer powers, per-segment
    * equi-join, Hamming via `bit_count(xor(...))` on the signed value —
    * the [[SimHashOracle.simhashNearDupSql]] tail verbatim.
    */
  val mediaNearDupSql: String =
    phashCore +
      s""",
         |doubled AS (
         |  SELECT doc_id, hu, phash FROM sfp
         |  UNION ALL SELECT doc_id + 1000000, hu, phash FROM sfp
         |),
         |segpw(seg, pw) AS (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
         |  (2, 4294967296::HUGEINT), (3, 281474976710656::HUGEINT)),
         |segs AS (
         |  SELECT doc_id, phash, seg, (hu // pw) % 65536 AS seg_val
         |  FROM doubled CROSS JOIN segpw
         |)
         |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.phash, b.phash)) AS hamming
         |FROM segs a JOIN segs b ON a.seg = b.seg AND a.seg_val = b.seg_val
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin

  /** Frame-level perceptual dedup: [[graft.functions.DHash64]] over every
    * sampled frame ([[frameSample]]), then frames whose fingerprint occurs
    * in ≥ 2 distinct documents — the repeated-asset detector (intro/outro
    * cards, boilerplate imagery) that video/image pipelines run, the same
    * two-level-aggregate + equi-join shape as [[Dedup.repeatedNgramSpans]].
    * Frames shorter than `minFrameBytes` are excluded: a near-empty tail
    * frame's comparison pattern is degenerate (fingerprint ~0) and would
    * cluster unrelated media.
    */
  def frameNearDup(spark: SparkSession, dir: String, every: Int = 4,
      minFrameBytes: Int = 16): DataFrame = {
    val fr = frameSample(spark, dir, every)
      .filter(length(col("frame")) >= minFrameBytes)
      .select(col("doc_id"), col("frame_idx"),
        graft.functions.DHash64(col("frame")).as("fhash"))
      .persist() // feeds the doc-frequency count and the re-join
    val rep = fr.select("doc_id", "fhash").distinct()
      .groupBy("fhash").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    fr.join(rep, Seq("fhash"))
      .select("fhash", "n_docs", "doc_id", "frame_idx")
      .orderBy("fhash", "doc_id", "frame_idx")
  }

  /** Exact mirror: the [[frameSampleDigestSql]] frame slicing + the
    * [[mediaPhashSql]] window arithmetic per (doc, frame), then the
    * two-level cross-doc support count. */
  val frameNearDupSql: String =
    s"""WITH media AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |frames AS (
       |  SELECT doc_id, unnest(range(0, (n + ${FrameBytes - 1}) // $FrameBytes, 4)) AS frame_idx, text
       |  FROM media WHERE n > 0
       |), fslice AS (
       |  SELECT doc_id, frame_idx,
       |    substr(text, frame_idx * $FrameBytes + 1, $FrameBytes) AS ftext
       |  FROM frames
       |), fkept AS (
       |  SELECT doc_id, frame_idx, ftext, length(ftext) AS fn
       |  FROM fslice WHERE length(ftext) >= 16
       |), fbytes AS (
       |  SELECT doc_id, frame_idx, fn, unnest(range(0, fn)) AS i, ftext FROM fkept
       |), cellsums AS (
       |  SELECT doc_id, frame_idx, (i * 65) // fn AS cell,
       |    sum(ord(substr(ftext, (i + 1)::BIGINT, 1))) AS s, count(*) AS c
       |  FROM fbytes GROUP BY 1, 2, 3
       |), grid AS (
       |  SELECT f.doc_id, f.frame_idx, g.cell, coalesce(cs.s // cs.c, 0) AS a
       |  FROM fkept f
       |  CROSS JOIN (SELECT unnest(range(0, 65)) AS cell) g
       |  LEFT JOIN cellsums cs ON cs.doc_id = f.doc_id
       |    AND cs.frame_idx = f.frame_idx AND cs.cell = g.cell
       |), bits(bit, pw) AS (VALUES $phashBitsRows),
       |fp AS (
       |  SELECT lo.doc_id AS doc_id, lo.frame_idx AS frame_idx,
       |    coalesce(sum(CASE WHEN hi.a > lo.a THEN pw ELSE 0 END), 0)::HUGEINT AS hu
       |  FROM grid lo
       |  JOIN grid hi ON hi.doc_id = lo.doc_id AND hi.frame_idx = lo.frame_idx
       |    AND hi.cell = lo.cell + 1
       |  JOIN bits b ON b.bit = lo.cell
       |  GROUP BY 1, 2
       |), sfp AS (
       |  SELECT doc_id, frame_idx,
       |    ((CASE WHEN hu >= ${BigInt(2).pow(63)} THEN hu - ${BigInt(2).pow(64)} ELSE hu END))::BIGINT AS fhash
       |  FROM fp
       |), rep AS (
       |  SELECT fhash, count(*) AS n_docs
       |  FROM (SELECT DISTINCT fhash, doc_id FROM sfp)
       |  GROUP BY fhash HAVING count(*) >= 2
       |)
       |SELECT fhash, n_docs, doc_id, frame_idx FROM sfp JOIN rep USING (fhash)
       |ORDER BY fhash, doc_id, frame_idx""".stripMargin

  /** The stubbed codec boundary. A real pipeline implements `decode` with an
    * actual image/audio library; everything around it (batching,
    * partitioning, schema) stays as-is.
    */
  object FeatureCodec {
    /** STUB — deterministic stand-in for a real media decoder + feature
      * model (codecs are not available in this environment). Derives a
      * `dim`-float vector from the payload bytes via a seeded PRNG, so
      * results are reproducible across runs and engines.
      */
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val seed = java.util.Arrays.hashCode(payload).toLong
      val rng = new java.util.Random(seed)
      Array.fill(dim)(rng.nextFloat())
    }
  }

  /** Distributed feature extraction over the media table. Runs the codec
    * per PARTITION over an iterator (never materializing the partition),
    * which is the JVM-side equivalent of the `mapInPandas` batch contract:
    * one executor task decodes a stream of payloads, emitting fixed-width
    * vectors. Partition count (not row count) bounds peak memory.
    */
  def extractFeatures(spark: SparkSession, dir: String, dim: Int = 8): DataFrame = {
    val media = mediaTable(spark, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = true),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    val out: Dataset[Row] = media.mapPartitions { rows =>
      rows.map { r =>
        val feature = FeatureCodec.decode(r.getAs[Array[Byte]]("payload"), dim)
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("mime"), feature.toSeq)
      }
    }(encoder)
    out.orderBy("doc_id")
  }

  /** Driver-facing query surface over [[extractFeatures]]: the raw
    * `array<float>` column is not hashable by the driver's pandas-side
    * compare (rows-only check crashes sorting ndarray cells), so the
    * REGISTERED query projects the vector to deterministic scalars — length,
    * a rounded element, and an md5 digest of the rounded-and-joined array.
    * Library callers wanting vectors use [[extractFeatures]] directly.
    */
  def extractFeaturesSummary(spark: SparkSession, dir: String, dim: Int = 8): DataFrame =
    extractFeatures(spark, dir, dim)
      .select(
        col("doc_id"), col("mime"),
        size(col("feature")).as("n_dims"),
        round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
        md5(concat_ws(",",
          transform(col("feature"), f => round(f.cast("double"), 6).cast("string")))
          .cast("binary")).as("feature_md5"))
      .orderBy("doc_id")
}
