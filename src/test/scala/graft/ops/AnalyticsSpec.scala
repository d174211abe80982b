package graft.ops

import graft.SparkSuite

/** Pins the approx-quartile scale path to the exact-ntile correctness
  * anchor: same bucket structure, per-bucket counts within the sketch's
  * error envelope, and a plan with no window (the exact form's per-type
  * sort is precisely what the approx path exists to avoid).
  */
class AnalyticsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("approx quartile buckets stay within the sketch envelope of exact ntile") {
    val exact = Analytics.valueQuartiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val approx = Analytics.valueQuartilesApprox(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet, "same (event_type, quartile) buckets")
    val perType = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    for (((tpe, q), nExact) <- exact) {
      val nApprox = approx((tpe, q))
      // accuracy 10000 ⇒ each boundary is within n/10000 ranks of exact;
      // a bucket has two boundaries, plus boundary ties (which ntile
      // splits but threshold assignment does not) — 1% of the type's rows
      // is a generous envelope that still catches a wrong bucket rule
      val tol = math.max(4L, perType(tpe) / 100)
      assert(math.abs(nApprox - nExact) <= tol,
        s"$tpe q$q: approx $nApprox vs exact $nExact (tol $tol)")
    }
  }

  test("approx quartile plan has no window operator") {
    val plan = Analytics.valueQuartilesApprox(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no Window in:\n$plan")
  }
}
