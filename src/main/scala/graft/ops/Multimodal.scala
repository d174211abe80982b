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
