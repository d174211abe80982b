package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, lazy). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  def sqlContextImplicits: SparkSession = spark
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the engine's extension plugin, as a production session would carry
      // it; every injected rule is conf-gated (default off), so suites see
      // stock behavior unless they opt in. The extension POSITION matters:
      // injected optimizer rules run before RewriteDistinctAggregates, so
      // the approx rewrite reaches multi-distinct aggregates that the
      // post-hoc extraOptimizations path (end of optimizer) cannot.
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
