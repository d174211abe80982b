package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and reads
  * parquet from `sfDir` — one file per table, schemas in FIXTURES.md.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark refuses
  * by default ([PARQUET_TYPE_ILLEGAL]). We read it as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds
  * with integer division — the same truncation DuckDB applies when it
  * coerces TIMESTAMP_NS to its microsecond TIMESTAMP, so both engines see
  * identical values. (Double division would lose precision at 1.7e18 ns.)
  *
  * `nanosAsLong` must be set at SESSION BUILD time (Verify, Bench,
  * SparkSuite all do) — the loader is pure and never mutates session
  * config: a global toggle flipped as a side effect of a table read is a
  * race in any multi-session deployment.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
