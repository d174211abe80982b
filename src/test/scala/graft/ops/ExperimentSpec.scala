package graft.ops

import java.security.MessageDigest

import graft.SparkSuite

class ExperimentSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("abCupedLift: arms, means, theta and adjusted means equal a brute walk") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val split = java.sql.Timestamp.valueOf(s"${Experiment.SplitDate} 00:00:00")
    // exact per-user cents (value carries 2 decimals)
    val pu = rows.groupBy(_._1).map { case (uid, evs) =>
      val x = evs.filter(e => e._3 == "purchase" && e._2.before(split))
        .map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      val y = evs.filter(e => e._3 == "purchase" && !e._2.before(split))
        .map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      val arm = if (md5hex(s"${Experiment.AbSeed}:$uid").charAt(0) <= '7')
        "control" else "treatment"
      (uid, arm, x, y)
    }.toSeq
    val nAll = pu.size.toDouble
    val sx = pu.map(_._3).sum.toDouble; val sy = pu.map(_._4).sum.toDouble
    val sxx = pu.map(u => u._3 * u._3).sum.toDouble
    val sxy = pu.map(u => u._3 * u._4).sum.toDouble
    val theta = (nAll * sxy - sx * sy) / (nAll * sxx - sx * sx)
    val out = Experiment.abCupedLift(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set("control", "treatment"),
      "both arms must be populated at this SF")
    for (arm <- Seq("control", "treatment")) {
      val members = pu.filter(_._2 == arm)
      val n = members.size.toDouble
      val mx = members.map(_._3).sum.toDouble / n
      val my = members.map(_._4).sum.toDouble / n
      val cuped = my - theta * (mx - sx / nAll)
      val (gn, gmx, gmy, gth, gcu) = out(arm)
      assert(gn == members.size.toLong, s"$arm n_users")
      assert(math.abs(gmx - mx) < 1e-4, s"$arm mean_x $gmx vs $mx")
      assert(math.abs(gmy - my) < 1e-4, s"$arm mean_y $gmy vs $my")
      assert(math.abs(gth - theta) < 1e-4, s"$arm theta $gth vs $theta")
      assert(math.abs(gcu - cuped) < 1e-4, s"$arm cuped $gcu vs $cuped")
    }
    // CUPED's point: adjusting with theta shrinks the per-user residual
    // variance of y relative to raw y (equality only if cov(x,y) = 0)
    val muX = sx / nAll; val muY = sy / nAll
    val rawVar = pu.map(u => math.pow(u._4.toDouble - muY, 2)).sum
    val adjVar = pu.map(u =>
      math.pow(u._4.toDouble - theta * (u._3.toDouble - muX) - muY, 2)).sum
    assert(adjVar <= rawVar + 1e-9, s"CUPED must not inflate variance: $adjVar > $rawVar")
  }

  test("abConversionZtest and abRankTest: statistics equal brute walks") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val split = java.sql.Timestamp.valueOf(s"${Experiment.SplitDate} 00:00:00")
    def armOf(uid: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Experiment.AbSeed}:$uid".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) <= '7') "control" else "treatment"
    }
    val pu = rows.groupBy(_._1).map { case (uid, evs) =>
      val post = evs.filter(e => e._3 == "purchase" && !e._2.before(split))
      val y = post.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (uid, armOf(uid), y > BigDecimal(Experiment.ConversionValue), y)
    }.toSeq
    val (nc, nt) = (pu.count(_._2 == "control").toLong, pu.count(_._2 == "treatment").toLong)
    val (cc, ct) = (pu.count(u => u._2 == "control" && u._3).toLong,
      pu.count(u => u._2 == "treatment" && u._3).toLong)
    // the test is live only if both rates are interior
    assert(cc > 0 && cc < nc && ct > 0 && ct < nt,
      s"conversion must be interior: $cc/$nc, $ct/$nt")
    // z-test
    val zt = Experiment.abConversionZtest(spark, dir).collect().head
    assert((zt.getLong(0), zt.getLong(1), zt.getLong(2), zt.getLong(3)) == ((nc, cc, nt, ct)))
    val pPool = (cc + ct).toDouble / (nc + nt)
    val zWant = (ct.toDouble / nt - cc.toDouble / nc) /
      math.sqrt(pPool * (1 - pPool) * (1.0 / nc + 1.0 / nt))
    assert(math.abs(zt.getDouble(4) - zWant) < 1e-4, s"z ${zt.getDouble(4)} vs $zWant")
    // rank test: doubled ranks with average-tie handling
    val ys = pu.map(_._4)
    def rank2(v: BigDecimal): Long = 2L * ys.count(_ < v) + ys.count(_ == v) + 1
    val r2c = pu.filter(_._2 == "control").map(u => rank2(u._4)).sum
    val u2c = r2c - nc * (nc + 1)
    val tie3 = ys.groupBy(identity).values.map(g => {
      val t = g.size.toLong; t * t * t - t }).sum
    val n = nc + nt
    val zr = (u2c.toDouble / 2.0 - nc.toDouble * nt / 2.0) /
      math.sqrt(nc.toDouble * nt / 12.0 *
        (n + 1.0 - tie3.toDouble / (n.toDouble * (n - 1.0))))
    val rt = Experiment.abRankTest(spark, dir).collect().head
    assert((rt.getLong(0), rt.getLong(1), rt.getLong(2)) == ((nc, nt, u2c)))
    assert(math.abs(rt.getDouble(3) - zr) < 1e-4, s"rank z ${rt.getDouble(3)} vs $zr")
  }

  test("abRankTestBucketed: two-phase prefix-sum ranks equal the anchor, any bucket width") {
    val dir = "/root/testdata/sf0.001"
    val anchor = Experiment.abRankTest(spark, dir).collect().toSeq
    // span-derived width, plus forced widths that split the value domain
    // into many buckets (1-cent buckets = one distinct value per bucket,
    // the extreme where the offset window carries ALL the rank work)
    for (bucket <- Seq(None, Some(1L), Some(137L))) {
      val twin = Experiment.abRankTestBucketed(spark, dir, bucket).collect().toSeq
      assert(twin == anchor, s"bucket=$bucket: $twin vs $anchor")
      spark.catalog.clearCache() // the twin persists its distinct-value table
    }
  }

  test("floorDivBucket: floor semantics on negatives keep bucket order monotone in value") {
    import spark.implicits._
    // refund-shaped domain: negative cents cross zero. SQL `div` truncates
    // toward zero, collapsing (-w, w) into bucket 0 — floor division must
    // agree with math.floorDiv everywhere, so bucket order ≡ value order.
    val cents = Seq(-250L, -137L, -1L, 0L, 1L, 99L, 137L, 250L, -274L)
    val w = 137L
    val got = cents.toDF("cents")
      .withColumn("bucket", Experiment.floorDivBucket(w))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (c <- cents)
      assert(got(c) == math.floorDiv(c, w), s"cents=$c")
    val sorted = cents.sorted
    assert(sorted.map(got) == sorted.map(got).sorted,
      "bucket key must be monotone over the signed domain")
  }

  test("abDiffInDiff and abSrmCheck: cell means and chi2 equal brute walks") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val split = java.sql.Timestamp.valueOf(s"${Experiment.SplitDate} 00:00:00")
    def armOf(uid: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Experiment.AbSeed}:$uid".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) <= '7') "control" else "treatment"
    }
    val pu = rows.groupBy(_._1).map { case (uid, evs) =>
      def s(pre: Boolean) = evs
        .filter(e => e._3 == "purchase" && (e._2.before(split) == pre))
        .map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (uid, armOf(uid), s(pre = true), s(pre = false))
    }.toSeq
    def cell(arm: String, pre: Boolean) = {
      val m = pu.filter(_._2 == arm)
      (if (pre) m.map(_._3).sum else m.map(_._4).sum).toDouble / m.size
    }
    val did = Experiment.abDiffInDiff(spark, dir).collect().head
    val (nc, nt) = (pu.count(_._2 == "control").toLong, pu.count(_._2 == "treatment").toLong)
    assert((did.getLong(0), did.getLong(1)) == ((nc, nt)))
    assert(math.abs(did.getDouble(2) - cell("control", pre = true)) < 1e-4)
    assert(math.abs(did.getDouble(3) - cell("control", pre = false)) < 1e-4)
    assert(math.abs(did.getDouble(4) - cell("treatment", pre = true)) < 1e-4)
    assert(math.abs(did.getDouble(5) - cell("treatment", pre = false)) < 1e-4)
    val want = (cell("treatment", pre = false) - cell("treatment", pre = true)) -
      (cell("control", pre = false) - cell("control", pre = true))
    assert(math.abs(did.getDouble(6) - want) < 1e-4)
    val srm = Experiment.abSrmCheck(spark, dir).collect().head
    val chi2 = ((nc - nt) * (nc - nt)).toDouble / (nc + nt)
    assert((srm.getLong(0), srm.getLong(1)) == ((nc, nt)))
    assert(math.abs(srm.getDouble(2) - chi2) < 1e-6)
    assert(srm.getBoolean(3) == (chi2 < 10.828), "pass flag must follow the bar")
  }

  test("abSequentialMsprt: always-valid p is monotone; the statistic re-derives from raw cumulants") {
    val dir = "/root/testdata/sf0.001"
    val rows = Experiment.abSequentialMsprt(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // released days are cumulative-complete and the p-value never rises
    for (Array(a, b) <- rows.sortBy(_._1).sliding(2).toSeq if rows.length > 1) {
      assert(b._2 >= a._2 && b._3 >= a._3, "cumulative counts must be monotone")
      assert(b._6 <= a._6 + 1e-12, "always-valid p must be non-increasing")
    }
    assert(rows.forall(r => r._6 > 0.0 && r._6 <= 1.0))
    assert(rows.forall(r => r._2 >= 2 && r._3 >= 2), "release gate: >= 2 obs per arm")
    // brute recompute of the last day's statistic from the raw purchases
    val fns = org.apache.spark.sql.functions
    val obs = Tables(spark, dir, "events")
      .filter(fns.col("event_type") === "purchase")
      .select(fns.to_date(fns.col("ts")).cast("string").as("day"),
        fns.substring(fns.md5(fns.concat(fns.lit(Experiment.AbSeed), fns.lit(":"),
          fns.col("user_id").cast("string")).cast("binary")), 1, 1).as("h"),
        (fns.col("value").cast("decimal(12,2)") * 100).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1) <= "7", r.getLong(2)))
    val last = rows.map(_._1).max
    val upTo = obs.filter(_._1 <= last)
    def cum(ctrl: Boolean) = {
      val xs = upTo.filter(_._2 == ctrl).map(_._3)
      (xs.length.toLong, xs.sum.toDouble, xs.map(x => x.toDouble * x).sum)
    }
    val ((nc, sc, ssc), (nt, st, sst)) = (cum(true), cum(false))
    val lastRow = rows.maxBy(_._1)
    assert((lastRow._2, lastRow._3) == ((nc, nt)), "final cumulative counts")
    val sig2 = ((ssc - sc * sc / nc) + (sst - st * st / nt)) / (nc + nt - 2)
    val v = sig2 * (1.0 / nc + 1.0 / nt)
    val tau2 = 100.0 * 100.0
    val delta = st / nt - sc / nc
    val logLam = 0.5 * math.log(v / (v + tau2)) +
      delta * delta * tau2 / (2.0 * v * (v + tau2))
    assert(math.abs(lastRow._5 - logLam) < 1e-4,
      s"log_lambda ${lastRow._5} vs brute $logLam")
    assert(math.abs(lastRow._4 - delta) < 1e-3, "delta re-derivation")
  }
}
