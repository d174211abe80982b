package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and reads
  * parquet from `sfDir` — one file per table, schemas in FIXTURES.md.
  *
  * `events.ts` has shipped in two physical layouts across driver
  * generations: parquet TIMESTAMP(NANOS) (rounds ≤8), which Spark refuses
  * by default ([PARQUET_TYPE_ILLEGAL]) and we read as a long via
  * `spark.sql.legacy.parquet.nanosAsLong` + integer-division truncation
  * to microseconds (the same truncation DuckDB applies coercing
  * TIMESTAMP_NS, so both engines see identical values); and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 9+), which Spark
  * infers as TIMESTAMP_NTZ and we cast to TIMESTAMP under the
  * UTC-pinned session timezone — the same wall-clock instants as the
  * nanos-era read, so every oracle stays hash-stable. The loader
  * dispatches on the type Spark actually inferred, so either generation
  * of testdata works — schema-drift tolerance a long-lived deployment
  * needs anyway, since a 100-TB lake is never one homogeneous vintage.
  *
  * `nanosAsLong` must be set at SESSION BUILD time (Verify, Bench,
  * SparkSuite all do) — the loader is pure and never mutates session
  * config: a global toggle flipped as a side effect of a table read is a
  * race in any multi-session deployment.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case TimestampType => raw // already TIMESTAMP with timezone semantics
        case TimestampNTZType => // TIMESTAMP(MICROS, isAdjustedToUTC=false):
          // the cast interprets the wall-clock in the SESSION timezone, so
          // it is only value-preserving under UTC — guard loudly like the
          // nanos-era require did, instead of silently shifting every
          // instant by the local offset in a non-UTC session
          val tz = spark.conf.get(
            "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
          val rules = java.time.ZoneId.of(tz).getRules
          require(rules.isFixedOffset &&
              rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
            s"session timezone is '$tz' — set spark.sql.session.timeZone=UTC " +
              "at session build to read events (the NTZ→timestamp cast is " +
              "timezone-sensitive)")
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case LongType      => // TIMESTAMP(NANOS) surfaced as long via nanosAsLong
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case other => sys.error(s"events.ts: unsupported parquet type $other")
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
