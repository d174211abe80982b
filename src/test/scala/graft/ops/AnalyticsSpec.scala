package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions.{col, date_format, to_date}

/** Pins the approx-quartile scale path to the exact-ntile correctness
  * anchor: same bucket structure, per-bucket counts within the sketch's
  * error envelope, and a plan with no window (the exact form's per-type
  * sort is precisely what the approx path exists to avoid).
  */
class AnalyticsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("rankFamily: every rank column re-derives from first principles per partition") {
    val rows = Analytics.rankFamily(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    val parts = rows.groupBy(t => (t._1, t._2))
    var sawTie = false
    for ((_, part) <- parts; (_, _, vb, rnk, drnk, prnk, cdist) <- part) {
      val n = part.length
      val below = part.count(_._3 < vb)
      val leq = part.count(_._3 <= vb)
      val distinctBelow = part.map(_._3).distinct.count(_ < vb)
      if (leq - below > 1) sawTie = true
      assert(rnk == below + 1, s"rank: $rnk vs ${below + 1}")
      assert(drnk == distinctBelow + 1, s"dense_rank: $drnk vs ${distinctBelow + 1}")
      assert(prnk == (if (n == 1) 0.0 else (rnk - 1).toDouble / (n - 1)))
      assert(cdist == leq.toDouble / n)
    }
    assert(sawTie, "no ties in any partition — the bucket key is too fine to exercise rank semantics")
  }

  test("scd2ValueTiers: half-open validity chain, no same-tier adjacency, event counts reconcile") {
    val segs = Analytics.scd2ValueTiers(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
    assert(segs.nonEmpty)
    val byUser = segs.groupBy(_._1)
    for ((_, us) <- byUser) {
      val ordered = us.sortBy(_._2).toSeq
      // seg_no dense from 1
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq)
      // valid_to chains to the next valid_from; only the last is open
      for (Seq(a, b) <- ordered.sliding(2))
        assert(a._5.contains(b._4), s"validity chain broken: $a -> $b")
      assert(ordered.last._5.isEmpty, "last segment must be open (valid_to NULL)")
      // adjacent segments never share a tier (else they'd be one segment)
      for (Seq(a, b) <- ordered.sliding(2))
        assert(a._3 != b._3, s"same-tier adjacency: $a / $b")
    }
    // total events across segments equals the raw event count
    val total = segs.map(_._6).sum
    val raw = Tables(spark, "/root/testdata/sf0.001", "events").count()
    assert(total == raw, s"segment n_events sum $total != events $raw")
  }

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

  test("rollingRevenue7d: frame matches a brute per-row recomputation") {
    val out = Analytics.rollingRevenue7d(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    val byCust = out.groupBy(_._2)
    val dayMs = 86400L * 1000L
    for ((_, rows) <- byCust.take(40)) {
      // brute force the frame MEMBERSHIP per row: every order of the same
      // customer dated in (d − 7 days, d] must be in the frame, nothing else
      for ((_, _, d, rev, n) <- rows) {
        val members = rows.filter { case (_, _, d2, _, _) =>
          d2 <= d && d2 > d - 7L * dayMs }
        assert(members.length == n, s"frame count $n vs brute ${members.length}")
        assert(rev > 0.0)
      }
      // same-day peers share the identical RANGE frame
      for ((_, g) <- rows.groupBy(_._3) if g.length > 1)
        assert(g.map(r => (r._4, r._5)).distinct.length == 1,
          s"same-day peers disagree: $g")
    }
  }

  test("scd2TemporalJoin: every purchase attributed exactly once; brute interval join agrees") {
    val out = Analytics.scd2TemporalJoin(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val purchases = Tables(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
    assert(out.values.map(_._1).sum == purchases.count(),
      "attribution lost or duplicated purchases")
    // brute force on one partition: join intervals in memory
    val dim = Analytics.scd2ValueTiers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    val facts = purchases.select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val brute = facts.map { case (u, ts, v) =>
      val tier = dim.filter { case (du, _, from, to) =>
        du == u && !ts.before(from) && to.forall(ts.before)
      }
      assert(tier.length == 1, s"purchase ($u, $ts) matched ${tier.length} intervals")
      (tier.head._2, v)
    }
    val bruteAgg = brute.groupBy(_._1).map { case (t, vs) =>
      t -> (vs.length.toLong, vs.map(v => BigDecimal(v._2).setScale(2)).sum.toDouble)
    }
    for ((t, (n, rev)) <- bruteAgg) {
      assert(out(t)._1 == n, s"tier $t count ${out(t)._1} vs brute $n")
      assert(math.abs(out(t)._2 - rev) < 0.01, s"tier $t revenue ${out(t)._2} vs brute $rev")
    }
  }

  test("fulfillmentSla equals a brute per-order latency re-derivation") {
    val out = Analytics.fulfillmentSla(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), date_format(to_date(col("l_shipdate")), "yyyy-MM-dd").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def day(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val firstShip = li.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val lats = ord.flatMap { case (k, pri, od) =>
      firstShip.get(k).map(fs => (pri, day(fs) - day(od))) }
    val brute = lats.groupBy(_._1).map { case (pri, g) =>
      val ls = g.map(_._2.toDouble).sorted
      // interpolating median (percentile/quantile_cont definition)
      val h = (ls.length - 1) * 0.5
      val med = ls(h.toInt) + (h - h.toInt) * (ls(math.ceil(h).toInt) - ls(h.toInt))
      pri -> ((g.length.toLong,
        BigDecimal(med).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        g.map(_._2).max, g.count(_._2 > Analytics.SlaDays).toLong))
    }
    assert(out == brute, s"SLA readout diverged:\n$out\nvs\n$brute")
    assert(out.values.exists(_._4 > 0), "no SLA breaches at this SF — threshold dead")
  }

  test("skylineOrders equals the brute quadratic dominance check") {
    val out = Analytics.skylineOrders(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))

    val rows = Tables(spark, dir, "orders")
      .select(date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("day"),
        col("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // brute: an order survives iff no other is cheaper-or-equal AND
    // newer-or-equal with one strict
    val survivors = rows.filter { r =>
      !rows.exists(s => s._2 <= r._2 && s._1 >= r._1 &&
        (s._2 < r._2 || s._1 > r._1))
    }
    val brute = survivors.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((day, p), g) =>
        (day, p, g.length.toLong, g.map(_._3).min) }
      .sortBy(_._1)
    assert(out.nonEmpty && out.toSeq == brute,
      "two-phase frontier must equal the quadratic dominance definition")
    // frontier law: an older survivor must undercut every newer day's
    // minimum, so prices strictly increase with day
    assert(out.sliding(2).forall(w => w.length < 2 || w(0)._2 < w(1)._2),
      "skyline prices must be strictly increasing with day")
  }
}
