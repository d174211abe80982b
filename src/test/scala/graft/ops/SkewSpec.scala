package graft.ops

import graft.SparkSuite

class SkewSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("salted join result equals the unsalted join (salting is layout-only)") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, dir, "events")
    val userFirst = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    val plain = ev.join(userFirst, "user_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg((unix_micros(col("ts")) - unix_micros(col("first_ts")))
          .cast("double") / 1e6), 2).as("avg_age_sec"))
      .orderBy("event_type")
      .collect().toSeq
    val salted = Skew.saltedUserAge(spark, dir).collect().toSeq
    assert(salted == plain)
  }

  test("approx distinct counts stay within the configured error of exact") {
    val exact = Tpch.distinctParts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Skew.distinctPartsApprox(spark, dir).collect()
    approx.foreach { r =>
      val (eParts, eSupps) = exact(r.getString(0))
      // rsd 0.02 → generous 10% assertion bound (HLL error is probabilistic)
      assert(math.abs(r.getLong(1) - eParts).toDouble / eParts < 0.1)
      assert(math.abs(r.getLong(2) - eSupps).toDouble / eSupps < 0.1)
    }
  }
}
