package graft.ops

import graft.SparkSuite

/** The ANSI-portable oracle SQL strings must produce the same result when
  * executed by Spark itself over temp views as the DataFrame-API queries do
  * — one query surface, two front-ends.
  */
class GraftSqlSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private val portable: Seq[(String, String)] = Seq(
    "tpch_q1" -> Tpch.q1Sql,
    "tpch_q4" -> Tpch.q4Sql,
    "tpch_q5" -> Tpch.q5Sql,
    "tpch_q6" -> Tpch.q6Sql,
    "tpch_q10" -> Tpch.q10Sql,
    "top_customers" -> Tpch.topCustomersSql,
    "distinct_parts" -> Tpch.distinctPartsSql,
    "customers_without_urgent" -> Tpch.customersWithoutUrgentSql,
    "parts_in_both_years" -> Tpch.partsInBothYearsSql,
    "suppliers_no_returns" -> Tpch.suppliersNoReturnsSql,
    // decision-support tail (q18 omitted: its oracle uses DuckDB strftime)
    "tpch_q7" -> TpchTail.q7Sql,
    "tpch_q8" -> TpchTail.q8Sql,
    "tpch_q13" -> TpchTail.q13Sql,
    "tpch_q15" -> TpchTail.q15Sql,
    "tpch_q17" -> TpchTail.q17Sql,
    "tpch_q19" -> TpchTail.q19Sql,
    "tpch_q22" -> TpchTail.q22Sql,
    // the schema-adapted remainder — all seven oracles are ANSI-portable
    "tpch_q2" -> TpchAdapted.q2Sql,
    "tpch_q9" -> TpchAdapted.q9Sql,
    "tpch_q11" -> TpchAdapted.q11Sql,
    "tpch_q12" -> TpchAdapted.q12Sql,
    "tpch_q16" -> TpchAdapted.q16Sql,
    "tpch_q20" -> TpchAdapted.q20Sql,
    "tpch_q21" -> TpchAdapted.q21Sql,
    // analytic windows (running_revenue / user_event_gaps omitted: their
    // oracles use DuckDB strftime / epoch_us)
    "top_orders_per_customer" -> Analytics.topOrdersPerCustomerSql,
    "value_quartiles" -> Analytics.valueQuartilesSql)

  test("ANSI oracle SQL runs on Spark and matches the DataFrame API") {
    GraftSql.registerTables(spark, dir)
    for ((name, sql) <- portable) {
      val viaSql = spark.sql(sql).collect().map(_.toString).toSeq
      val viaApi = graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).toSeq
      assert(viaSql == viaApi, s"$name: SQL and DataFrame results differ")
    }
  }
}
