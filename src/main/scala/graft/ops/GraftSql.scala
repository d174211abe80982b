package graft.ops

import org.apache.spark.sql.SparkSession

/** SQL query surface: register the testdata tables as temp views so the
  * whole suite is also reachable through `spark.sql(...)`. The oracle SQL
  * strings that stay within ANSI (the TPC-H family) run unchanged on BOTH
  * engines — DuckDB for verification and Spark for execution — which
  * `GraftSqlSpec` exploits to prove DataFrame-API/SQL parity.
  */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Create one temp view per testdata table over `sfDir`. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
