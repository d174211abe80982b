package graft.ops

import graft.SparkSuite

class EventsSpec extends SparkSuite {

  test("approx percentiles stay within the sketch's rank-error bound of exact") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val exact = Events.valuePercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Events.valuePercentilesApprox(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    // accuracy 10000 on ~2k-row groups → the sketch is near-exact; allow a
    // loose 5% relative envelope so the spec pins the bound, not the noise
    for ((k, (p50, p95)) <- exact) {
      assert(math.abs(approx(k)._1 - p50) <= 0.05 * math.abs(p50) + 1e-6, s"$k p50")
      assert(math.abs(approx(k)._2 - p95) <= 0.05 * math.abs(p95) + 1e-6, s"$k p95")
    }
  }

  test("bucketized interval join equals the naive non-equi join") {
    val dir = "/root/testdata/sf0.001"
    val bucketed = RangeJoin.eventsInWindows(spark, dir)
    val brute = RangeJoin.eventsInWindowsBrute(spark, dir)
    assert(bucketed.count() > 0)
    assert(bucketed.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(bucketed).count() == 0)
  }

  test("session_window twin equals the gaps-and-islands sessionization") {
    // the two differ only on exact-gap boundaries (> vs >=); nanosecond
    // event timestamps make such a gap vanishingly unlikely, so on the
    // testdata the outputs must be identical row-for-row
    val dir = "/root/testdata/sf0.001"
    val gi = Events.sessions(spark, dir)
    val sw = Events.sessionsViaSessionWindow(spark, dir)
    assert(gi.exceptAll(sw).count() == 0)
    assert(sw.exceptAll(gi).count() == 0)
  }

  test("propsJsonStats: totals reconcile with the table; malformed payloads yield typed nulls") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.propsJsonStats(spark, dir).collect()
    assert(out.nonEmpty)
    val total = Tables(spark, dir, "events").count()
    assert(out.map(_.getLong(1)).sum == total, "per-type counts don't cover the table")
    for (r <- out) assert(r.getInt(2) <= r.getInt(3), s"min above max: $r")
    // malformed payload: typed null, not a scan failure
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val parsed = Seq("""{"k": 7}""", "not json at all", """{"k": "NaNope"}""")
      .toDF("props")
      .select(org.apache.spark.sql.functions.from_json($"props", schema)
        .getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(parsed.toSeq == Seq(Some(7), None, None))
  }

  test("orderedFunnel: stage counts match a brute first-touch ordering; funnel is monotone") {
    val dir = "/root/testdata/sf0.001"
    val r = Events.orderedFunnel(spark, dir).collect()(0)
    val (viewed, vc, full) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(viewed >= vc && vc >= full && full > 0, s"funnel not monotone: $r")
    val rows = Tables(spark, dir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2)))
    val byUser = rows.groupBy(_._1)
    def first(g: Array[(Long, String, java.sql.Timestamp)], t: String) =
      g.filter(_._2 == t).map(_._3).minOption
    val brute = byUser.values.map { g =>
      (first(g.toArray, "view"), first(g.toArray, "click"), first(g.toArray, "purchase"))
    }
    assert(brute.count(_._1.isDefined).toLong == viewed)
    assert(brute.count(t => t._1.isDefined && t._2.isDefined &&
      t._1.get.before(t._2.get)).toLong == vc)
    assert(brute.count(t => t._1.isDefined && t._2.isDefined && t._3.isDefined &&
      t._1.get.before(t._2.get) && t._2.get.before(t._3.get)).toLong == full)
  }

  test("valueMadOutliers: med/MAD/outlier counts equal an in-memory sort re-derivation") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val rows = Tables(spark, dir, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = rows.groupBy(_._1).map { case (t, vs) =>
      val sorted = vs.map(_._2).sorted
      def lowerMedian(xs: Array[Double]): Double = xs((xs.length - 1) / 2)
      val med = lowerMedian(sorted)
      val mad = lowerMedian(vs.map(v => math.abs(v._2 - med)).sorted)
      val out = vs.count(v => math.abs(v._2 - med) > mad * 3.0).toLong
      t -> (vs.length.toLong, med, mad, out)
    }
    val got = Events.valueMadOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(got == expected, s"histogram medians diverge:\n$got\nvs\n$expected")
    assert(got.values.exists(_._4 > 0), "the heavy-tailed corpus plants outliers")
  }

  test("revenuePareto: boundary-band selection equals the global-sort derivation") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val rev = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(org.apache.spark.sql.functions.sum(
        col("o_totalprice").cast("decimal(15,2)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val sorted = rev.map { case (k, v) => (k, BigDecimal(v)) }
      .sortBy { case (k, v) => (-v, k) }
    val t = sorted.map(_._2).sum
    var cum = BigDecimal(0); var n = 0
    while (cum * 2 < t) { cum += sorted(n)._2; n += 1 }
    val row = Analytics.revenuePareto(spark, dir).collect()(0)
    assert(row.getLong(0) == n.toLong, s"n_customers ${row.getLong(0)} vs $n")
    assert(row.getLong(1) == rev.length.toLong)
    assert(math.abs(row.getDouble(2) - cum.toDouble) < 1e-6, "covered revenue")
    assert(row.getDouble(4) >= 0.5 && row.getDouble(4) < 1.0)
    // taking from the top, half the revenue never needs more than half
    // the customers (equality only under perfect uniformity)
    assert(n <= (rev.length + 1) / 2, s"selection not top-heavy: $n of ${rev.length}")
  }

  test("conversionLatency: buckets cover exactly the converting users; bounds inside buckets") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.conversionLatency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val funnel = Events.orderedFunnel(spark, dir).collect()(0)
    // converting users here = first view < first purchase (no click
    // requirement) — recompute independently
    val rows = Tables(spark, dir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2)))
    val conv = rows.groupBy(_._1).values.count { g =>
      val v = g.filter(_._2 == "view").map(_._3).minOption
      val p = g.filter(_._2 == "purchase").map(_._3).minOption
      v.isDefined && p.isDefined && v.get.before(p.get)
    }
    assert(out.map(_._2).sum == conv.toLong, s"bucket total vs $conv converters")
    assert(funnel.getLong(0) >= conv, "sanity: viewers >= converters")
    for ((b, _, lo, hi) <- out) {
      assert(lo / 1800 == b && hi / 1800 == b, s"bounds outside bucket $b: $lo..$hi")
      assert(lo <= hi && lo >= 0)
    }
  }

  test("eventTransitions: shares sum to 1 per prev; counts match a brute lag derivation") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.eventTransitions(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(out.nonEmpty)
    for ((prev, g) <- out.groupBy(_._1._1))
      assert(math.abs(g.map(_._2._2).sum - 1.0) < 1e-9, s"$prev shares don't sum to 1")
    val rows = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val brute = rows.groupBy(_._1).values.flatMap { g =>
      val s = g.toArray.sortBy(x => (x._2.getTime, x._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.map(x => x._1 -> x._2._1).toMap == brute, "transition counts differ from brute")
  }

  test("cohortRetention: day-0 row covers every purchaser; matrix equals a brute recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.cohortRetention(spark, dir).collect()
      .map(r => ((r.getTimestamp(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.nonEmpty)
    // brute force from raw rows
    val rows = Tables(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.truncatedTo(
        java.time.temporal.ChronoUnit.DAYS)))
    val firsts = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val brute = rows.map { case (u, d) =>
      val c = firsts(u)
      ((c, java.time.Duration.between(c, d).toDays), u)
    }.distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(out.size == brute.size, s"matrix ${out.size} cells vs brute ${brute.size}")
    // every user appears in their cohort's day-0 cell
    val day0 = out.collect { case ((c, 0L), n) => c.toInstant -> n }.toMap
    val cohortSizes = firsts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((c, n) <- cohortSizes) assert(day0(c) == n, s"cohort $c day-0 $n vs ${day0.get(c)}")
    // full matrix equality
    for ((k, n) <- brute)
      assert(out(( java.sql.Timestamp.from(k._1), k._2)) == n, s"cell $k")
  }

  test("hourValueRegression: slope/intercept match an independent OLS on raw rows") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.hourValueRegression(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    val rows = Tables(spark, dir, "events")
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC).getHour.toDouble,
        r.getDouble(2)))
    for ((t, (n, slope, intercept)) <- out) {
      val g = rows.filter(_._1 == t)
      assert(g.length.toLong == n)
      val (xs, ys) = (g.map(_._2), g.map(v => BigDecimal(v._3).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val bruteSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val bruteIntercept = (sy - bruteSlope * sx) / n
      assert(math.abs(slope - bruteSlope) < 1e-9, s"$t slope $slope vs $bruteSlope")
      assert(math.abs(intercept - bruteIntercept) < 1e-6, s"$t intercept")
    }
  }

  test("winsorizedStats: boundaries are true order statistics; clipping bounds hold") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.winsorizedStats(spark, dir).collect()
    assert(out.nonEmpty)
    val values = Tables(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (r <- out) {
      val (t, n, nLo, nHi, p05, p95, mean) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val vs = values(t)
      assert(n == vs.length.toLong)
      val k = math.max(1, vs.length / 20)
      // the order statistics themselves, from a plain in-memory sort
      assert(p05 == vs(k - 1), s"$t p05 $p05 vs sorted ${vs(k - 1)}")
      assert(p95 == vs(vs.length - k), s"$t p95 $p95 vs sorted ${vs(vs.length - k)}")
      assert(nLo == vs.count(_ < p05).toLong, s"$t n_clipped_lo")
      assert(nHi == vs.count(_ > p95).toLong, s"$t n_clipped_hi")
      assert(mean >= p05 && mean <= p95, s"$t winsorized mean outside [p05, p95]")
      val bruteMean = vs.map(v => BigDecimal(math.max(p05, math.min(p95, v))).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.length
      assert(math.abs(mean - bruteMean) < 1e-9, s"$t mean $mean vs brute $bruteMean")
    }
  }

  test("bootstrapMeanCi: replicate order statistics equal a JVM md5 re-derivation; interval brackets the mean") {
    val dir = "/root/testdata/sf0.001"
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables(spark, dir, "events")
      .selectExpr("event_type", "event_id", "CAST(CAST(value AS DECIMAL(15,2)) AS STRING) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getString(2))))
    val got = Events.bootstrapMeanCi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    for ((t, n, mean, lo, hi) <- got) {
      val mine = rows.filter(_._1 == t)
      assert(n == mine.length)
      val reps = (0 until Events.BootReps).map { b =>
        val seed = if (b < 8) "bsA:" else "bsB:"
        val off = (b % 8) * 4
        var sw = BigDecimal(0); var nw = 0L
        for ((_, id, y) <- mine) {
          val h = md5Hex(seed + id)
          val w = (0 until 4).count(i => h.charAt(off + i) < '4')
          sw += y * w; nw += w
        }
        sw.toDouble / nw
      }.sorted
      assert(lo == reps(1) && hi == reps(14),
        s"$t order stats: got ($lo, $hi) want (${reps(1)}, ${reps(14)})")
      assert(lo <= mean && mean <= hi, s"$t interval misses the mean")
      assert((hi - lo) / mean < 0.5, s"$t interval implausibly wide")
    }
  }

  test("sequenceMatchConversions: flags equal a per-user in-memory NFA walk; exclusion bites") {
    val dir = "/root/testdata/sf0.001"
    val raw = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._1).map { case (u, evs) =>
      val seq = evs.sortBy(e => (e._2.getTime, e._3)).map(_._4.head).mkString
      (u, evs.length.toLong,
        Events.ConversionPattern.r.findFirstIn(seq).isDefined)
    }.toSet
    val got = Events.sequenceMatchConversions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
    assert(got.exists(_._3) && got.exists(!_._3), "both outcomes present")
    // the exclusion is load-bearing: the plain ordered funnel (no error
    // constraint) must admit at least one user this pattern rejects
    val loose = raw.groupBy(_._1).count { case (_, evs) =>
      val seq = evs.sortBy(e => (e._2.getTime, e._3)).map(_._4.head).mkString
      "v.*c.*p".r.findFirstIn(seq).isDefined
    }
    assert(loose > got.count(_._3), "error exclusion should reject someone")
  }

  test("eventTrigrams: counts and Markov-1 lift re-derive from raw sequences") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.eventTrigrams(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val seqs = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2.getTime, e._3)).map(_._4).toSeq).toMap
    val tri = scala.collection.mutable.Map.empty[(String, String, String), Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    for (s0 <- seqs.values) {
      s0.sliding(3).filter(_.length == 3).foreach { w =>
        tri((w(0), w(1), w(2))) = tri.getOrElse((w(0), w(1), w(2)), 0L) + 1 }
      s0.sliding(2).filter(_.length == 2).foreach { w =>
        bi((w(0), w(1))) = bi.getOrElse((w(0), w(1)), 0L) + 1 }
    }
    val nb = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    // top-k by (n3 desc, path) must match, with exact lift
    val want = tri.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    assert(out.length == math.min(20, tri.size))
    for ((row, ((a, b, c), n3)) <- out.zip(want)) {
      assert((row.getString(0), row.getString(1), row.getString(2)) == ((a, b, c)))
      assert(row.getLong(3) == n3)
      val exp = bi((a, b)).toDouble * bi((b, c)) / nb(b)
      assert(math.abs(row.getDouble(4) - exp) < 1e-4, s"expected $exp got ${row.getDouble(4)}")
      assert(math.abs(row.getDouble(5) - n3 * nb(b).toDouble / (bi((a, b)).toDouble * bi((b, c)))) < 1e-4)
    }
  }

  test("multiTouchAttribution: ppm credits equal a brute per-conversion walk") {
    val dir = "/root/testdata/sf0.001"
    val out = Events.multiTouchAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val rows = Tables(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L
        + (r.getTimestamp(1).getNanos / 1000) % 1000, r.getLong(2), r.getString(3)))
    val byUser = rows.groupBy(_._3)
    // brute: per purchase, collect in-lookback touches, rank by recency
    val acc = scala.collection.mutable.Map.empty[String, Array[Long]]
    val convs = scala.collection.mutable.Map.empty[String, Set[Long]].withDefaultValue(Set())
    for ((_, evs) <- byUser; (cid, cus, _, tp) <- evs if tp == "purchase") {
      val touches = evs.filter(e => e._4 != "purchase" && e._2 < cus &&
          cus - e._2 <= Events.AttributionLookbackSeconds * 1000000L)
        .sortBy(e => (-e._2, -e._1))
      val n = touches.length.toLong
      for (((tid, _, _, ch), i) <- touches.zipWithIndex) {
        val pos = i + 1L
        val lin = 1000000L / n
        val rnk = ((n - pos + 1) * 2000000L) / (n * (n + 1))
        val ush =
          if (n == 1) 1000000L else if (n == 2) 500000L
          else if (pos == 1 || pos == n) 400000L else 200000L / (n - 2)
        val a = acc.getOrElseUpdate(ch, Array(0L, 0L, 0L, 0L))
        a(0) += 1; a(1) += lin; a(2) += rnk; a(3) += ush
        convs(ch) = convs(ch) + cid
      }
    }
    assert(out.keySet == acc.keySet && out.nonEmpty)
    for ((ch, a) <- acc) {
      val (nt, nc, lin, rnk, ush) = out(ch)
      assert(nt == a(0) && nc == convs(ch).size.toLong, s"counts for $ch")
      assert(lin == a(1), s"linear $ch: got $lin want ${a(1)}")
      assert(rnk == a(2), s"rank $ch: got $rnk want ${a(2)}")
      assert(ush == a(3), s"ushape $ch: got $ush want ${a(3)}")
    }
    // model sanity: total credit never exceeds one unit per touched
    // conversion (integer-div truncation only ever loses credit)
    val touched = convs.values.flatten.toSet.size.toLong
    for (i <- 1 to 3)
      assert(acc.values.map(_(i)).sum <= touched * 1000000L)
  }

  test("debounceEvents equals a brute burst walk per (user, type)") {
    val dir = "/root/testdata/sf0.01" // sf0.001 is too sparse for any burst
    val out = Events.debounceEvents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val ev = Tables(spark, dir, "events")
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000L, r.getLong(3)))
    val brute = ev.groupBy(e => (e._1, e._2)).flatMap { case (k, g) =>
      val ts = g.sortBy(e => (e._3, e._4)).map(_._3)
      val bursts = scala.collection.mutable.ArrayBuffer[Long]()
      var cur = 0L
      for ((t, i) <- ts.zipWithIndex) {
        if (i == 0 || t - ts(i - 1) > Events.DebounceMicros) {
          if (cur > 0) bursts += cur; cur = 1L
        } else cur += 1
      }
      bursts += cur
      val (total, kept, mx) = (ts.length.toLong, bursts.length.toLong, bursts.max)
      if (total > kept) Some(k -> ((total, kept, mx))) else None
    }
    assert(out == brute, "window burst form must equal the sequential walk")
    assert(out.nonEmpty, "no bursts collapsed at this SF — debounce untested")
    // conservation: kept <= total everywhere, and max burst is >= 2 on
    // every reported key (a key with only singleton bursts dedups nothing)
    assert(out.values.forall { case (t, k, m) => k < t && m >= 2 })
  }

  test("userFeatureStore equals a brute per-user re-derivation") {
    import org.apache.spark.sql.functions.{col, date_format, to_date}
    val dir = "/root/testdata/sf0.001"
    val out = Events.userFeatureStore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))).toMap

    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    def day(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val brute = ev.groupBy(_._1).map { case (u, g) =>
      val days = g.map(_._3).distinct
      val total = g.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)).sum
      u -> ((g.length.toLong, g.map(_._2).distinct.length.toLong,
        days.length.toLong, day(days.max) - day(days.min) + 1,
        total.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(g.map(_._4).max).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        1000L * g.length / days.length))
    }
    assert(out.keySet == brute.keySet)
    for ((u, want) <- brute) {
      val got = out(u)
      assert(got._1 == want._1 && got._2 == want._2 && got._3 == want._3 &&
        got._4 == want._4 && got._7 == want._7, s"user $u ints: $got vs $want")
      assert(math.abs(got._5 - want._5) < 0.02, s"user $u total_value")
      assert(math.abs(got._6 - want._6) < 0.005, s"user $u max_value")
    }
  }

  test("shapleyAttribution: brute recompute matches; efficiency identity holds") {
    val dir = "/root/testdata/sf0.001"
    val fns = org.apache.spark.sql.functions
    val out = Events.shapleyAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("click", "error", "signup", "view"))
    // brute exposure sets + conversion flags from the raw events
    val ev = Tables(spark, dir, "events")
      .select(fns.col("user_id"), fns.col("event_type"),
        fns.unix_micros(fns.col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bitOf = Map("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val firstConv = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val users = ev.map(_._1).distinct
    val maskOf = users.map { u =>
      val cut = firstConv.get(u)
      val bits = ev.filter(e => e._1 == u && e._2 != "purchase" &&
        cut.forall(e._3 < _)).map(e => bitOf(e._2)).distinct
      u -> bits.sum
    }.toMap
    val sets = users.groupBy(maskOf)
      .map { case (m, us) => m -> (us.size, us.count(firstConv.contains)) }
    def v(m: Int): Double =
      sets.get(m).map { case (n, c) => c.toDouble / n }.getOrElse(0.0)
    val numByCard = Map(0 -> 6, 1 -> 2, 2 -> 2, 3 -> 6)
    for ((ch, bit) <- bitOf) {
      val terms = (0 until 16).filter(s => (s & bit) == 0).map { s =>
        BigDecimal(numByCard(Integer.bitCount(s)) * (v(s | bit) - v(s)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val want = BigDecimal(terms.sum.toDouble / 24.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(ch) - want) < 1e-12, s"$ch: ${out(ch)} vs $want")
    }
    // efficiency: the allocations exhaust v(full) − v(∅) under the same
    // unobserved-set-is-zero convention (up to the 6-dp release rounding)
    assert(math.abs(out.values.sum - (v(15) - v(0))) < 4e-6,
      s"sum ${out.values.sum} vs ${v(15) - v(0)}")
  }

  test("markovRemovalAttribution: brute chain recompute matches; effects non-negative, shares sum to 1") {
    val dir = "/root/testdata/sf0.001"
    val fns = org.apache.spark.sql.functions
    val out = Events.markovRemovalAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set("click", "error", "signup", "view"))
    assert(out.values.forall(_._1 >= -1e-12), "removal cannot HELP conversion")
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 4e-6, "shares sum to 1")
    // brute: rebuild journeys, transition matrix, and the K-step chain
    val ev = Tables(spark, dir, "events")
      .select(fns.col("user_id"), fns.col("event_type"),
        fns.unix_micros(fns.col("ts")).as("us"), fns.col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val stIdx = Map("click" -> 2, "error" -> 3, "signup" -> 4, "view" -> 5)
    val firstConv = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val c = Array.ofDim[Long](6, 8)
    for (u <- ev.map(_._1).distinct) {
      val cut = firstConv.get(u)
      val js = ev.filter(e => e._1 == u && e._2 != "purchase" &&
          cut.forall(e._3 < _))
        .sortBy(e => (e._3, e._4)).map(e => stIdx(e._2)).toList
      if (js.isEmpty) { if (cut.isDefined) c(1)(6) += 1 }
      else {
        c(1)(js.head) += 1
        for (List(a, b) <- js.sliding(2) if js.length > 1) c(a)(b) += 1
        // terminal: conv absorbs at 6; null edges (7) only contribute to
        // the row total — the substochastic remainder
        c(js.last)(if (cut.isDefined) 6 else 7) += 1
      }
    }
    def absorb(pin: Int): Double = {
      val rr = (1 to 5).map(i => (1 to 7).map(j => c(i)(j)).sum)
      def t(i: Int, j: Int): Double =
        if (rr(i - 1) > 0) c(i)(j).toDouble / rr(i - 1).toDouble else 0.0
      var p = Array.fill(6)(0.0)
      for (_ <- 1 to Events.MarkovAbsorbSteps) {
        val np = Array.fill(6)(0.0)
        for (i <- 1 to 5 if i != pin)
          np(i) = (1 to 5).map(j => t(i, j) * p(j)).sum + t(i, 6)
        p = np
      }
      p(1)
    }
    val base = absorb(0)
    for ((ch, idx) <- stIdx) {
      val want = BigDecimal(1.0 - absorb(idx) / base)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(ch)._1 - want) < 2e-6,
        s"$ch: effect ${out(ch)._1} vs brute $want")
    }
  }

  test("kmPurchaseGaps: KM invariants hold and the curve re-derives from a brute recompute") {
    val dir = "/root/testdata/sf0.001"
    val rows = Events.kmPurchaseGaps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // telescoping risk set + monotone survival in [0, 1]
    for (Array(a, b) <- rows.sliding(2) if rows.length > 1) {
      assert(b._2 == a._2 - a._3 - a._4, "n_risk must telescope by d + c")
      assert(b._5 <= a._5 + 1e-12, "survival must be non-increasing")
    }
    assert(rows.forall(r => r._5 >= 0.0 && r._5 <= 1.0 && r._6 >= 0.0))
    // every purchasing user contributes exactly ONE censored final gap
    val users = Tables(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_._4).sum == users, "one censored open gap per user")
    // brute recompute of the full curve from raw purchase times
    val p = Tables(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = p.map(_._2).max
    val gaps = p.groupBy(_._1).values.flatMap { es =>
      val ts = es.map(_._2).sorted
      ts.zip(ts.drop(1) :+ -1L).map { case (a, b) =>
        if (b >= 0) ((b - a) / 3600000000L, true) else ((mx - a) / 3600000000L, false)
      }
    }.toSeq
    var (rem, surv) = (gaps.size.toLong, 1.0)
    for ((t, nRisk, d, c, s6, _) <- rows) {
      val dd = gaps.count(g => g._1 == t && g._2)
      val cc = gaps.count(g => g._1 == t && !g._2)
      assert((d, c) == ((dd.toLong, cc.toLong)), s"t=$t counts")
      assert(nRisk == rem, s"t=$t risk set")
      surv *= 1.0 - dd.toDouble / rem
      rem -= dd + cc
      assert(math.abs(s6 - BigDecimal(surv).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, s"t=$t survival")
    }
  }
}
