package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IpsPolicySpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  private def cells() = Tables(spark, dir, "events")
    .select((col("user_id") % 10).as("segment"), col("event_type"),
      (col("value").cast("decimal(12,2)") * 100).cast("bigint").as("cents"))
    .groupBy("segment", "event_type")
    .agg(count(lit(1)).as("n_a"), sum("cents").as("cents_a"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("v_ips re-derives from the closed form; best action is the mean argmax; ess <= n") {
    val out = Experiment.ipsPolicyValue(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val bySeg = cells().groupBy(_._1)
    assert(out.keySet == bySeg.keySet)
    for ((seg, cs) <- bySeg) {
      val r = out(seg)
      val means = cs.map { case (_, a, n, c) => a -> c.toDouble / (100.0 * n) }.toMap
      val best = means.toSeq.minBy { case (a, m) => (-m, a) }._1
      assert(r.getString(3) == best, s"seg $seg best ${r.getString(3)} vs $best")
      val k = cs.length
      def pi(a: String) = if (a == best) 0.9 else (1.0 - 0.9) / (k - 1)
      // closed form with exact empirical propensities: Σ_a π(a)·mean(a),
      // summed on the DECIMAL(24,12) grid like the operator
      val vIps = cs.map { case (_, a, _, _) =>
        BigDecimal(pi(a) * means(a)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val want = vIps.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - want) < 1e-12,
        s"seg $seg v_ips ${r.getDouble(5)} vs $want")
      assert(r.getDouble(6) <= r.getLong(1) + 1e-9, "ESS cannot exceed n")
    }
  }

  test("uniform target policy: v_ips collapses to the plain average of cell means") {
    // piBest = 0.2 with 5 observed actions makes π uniform (0.8/4 = 0.2):
    // the propensity-corrected value must equal the unweighted mean of means
    val out = Experiment.ipsPolicyValue(spark, dir, piBest = "0.2").collect()
    for (r <- out) {
      assert(r.getLong(2) == 5, "panel has all 5 actions per segment")
      val cs = cells().filter(_._1 == r.getLong(0))
      val want = cs.map { case (_, _, n, c) =>
        BigDecimal(0.2 * (c.toDouble / (100.0 * n)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - want) < 1e-12)
    }
  }
}
