package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interchange-format legs beyond parquet: CSV (the lossy, schemaless
  * wire format every upstream system still emits) and ORC (the other
  * columnar container a lakehouse inherits). The engine's contract for
  * both: an explicit schema, a declared malformed-row policy, and parity
  * with the parquet truth — never schema inference in production (one
  * inference pass is a full extra scan at 100 TB, and a column that is
  * all-null in the sampled files silently types as string).
  *
  * CSV malformed-row policy is Spark's PERMISSIVE contract: broken lines
  * land whole in `_corrupt_record` with every data column null, so the
  * pipeline can QUARANTINE them (count, store, alert — the
  * [[graft.ops.TableChecks]] gate) instead of dying mid-scan (FAILFAST,
  * also exposed, is for promotion gates where any corruption must abort).
  *
  * Scale shape: CSV scans parallelize by line ranges but carry no
  * statistics, no projection pushdown beyond column pruning, and no
  * predicate pushdown — the reason [[csvToParquet]] exists: land CSV
  * once, convert once, query parquet forever. ORC keeps parquet's
  * min/max/dictionary stats, so filters push into the scan the same way.
  */
object FileFormats {

  /** Timestamp wire format: microsecond fraction, no zone designator —
    * interpreted in the (UTC-pinned) session zone for TIMESTAMP and
    * literally for TIMESTAMP_NTZ, so the round-trip is lossless either
    * way. The DEFAULT format writes milliseconds only, silently
    * truncating microsecond event times — the reason this is pinned. */
  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Export a table as headered CSV (deterministic content). */
  def writeEventsCsv(events: DataFrame, out: String): Unit =
    events.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsFormat)
      .csv(out)

  /** Read a CSV with the DECLARED schema (pass the catalog's
    * authoritative schema — never inference). `permissive = true`
    * quarantines malformed lines into `_corrupt_record`; `false` runs
    * FAILFAST (first broken line aborts the scan). */
  def readEventsCsv(spark: SparkSession, path: String, dataSchema: StructType,
      permissive: Boolean = true): DataFrame = {
    val schema =
      if (permissive) dataSchema.add("_corrupt_record", StringType)
      else dataSchema
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsFormat)
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }

  /** The landing-zone conversion: CSV in, parquet out, corrupt rows
    * split off for quarantine. Returns (clean rows written, corrupt rows
    * written). */
  def csvToParquet(spark: SparkSession, csvPath: String, dataSchema: StructType,
      parquetOut: String, quarantineOut: String): (Long, Long) = {
    val raw = readEventsCsv(spark, csvPath, dataSchema).cache()
    try {
      val corrupt = raw.filter(col("_corrupt_record").isNotNull)
      val clean = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
      clean.write.mode("overwrite").parquet(parquetOut)
      corrupt.select("_corrupt_record").write.mode("overwrite").parquet(quarantineOut)
      (clean.count(), corrupt.count())
    } finally { raw.unpersist(); () }
  }

  /** Schema-evolution read: a landing zone accumulates parquet batches
    * whose schemas GROW over time (new telemetry fields appear; old
    * files never rewrite). `mergeSchema` unions the per-file schemas —
    * rows from pre-evolution files carry typed nulls in the new columns,
    * the additive-only contract (dropping or retyping a column is a
    * rewrite, not an evolution). Off by default in Spark because footer
    * merging costs one pass over file metadata — turned on explicitly
    * here, at the landing zone only, never on the query path.
    */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** ORC round trip: same columnar guarantees as parquet from the query
    * planner's perspective (stats + pushdown). */
  def writeEventsOrc(events: DataFrame, out: String): Unit =
    events.write.mode("overwrite").orc(out)

  def readEventsOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
