package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("forecastBacktest: metrics equal a brute seasonal-naive walk") {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byKey = daily.map(d => (d._1, d._2) -> d._3).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = daily.flatMap { case (t, day, n) =>
      byKey.get((t, day.minusDays(7))).map(yhat => (t, n, yhat))
    }.groupBy(_._1).map { case (t, rows) =>
      val errs = rows.map(r => r._2 - r._3)
      val sterms = rows.map(r =>
        BigDecimal(2.0 * math.abs(r._2 - r._3).toDouble / (r._2 + r._3))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP))
      (t, rows.size.toLong,
        r6(sterms.sum.toDouble / rows.size),
        r6(errs.map(math.abs).sum.toDouble / rows.size),
        r6(errs.sum.toDouble / rows.size))
    }.toSet
    val out = TimeSeries.forecastBacktest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(out == brute, s"backtest diverges: ${(out diff brute).take(3)} vs ${(brute diff out).take(3)}")
    assert(out.nonEmpty && out.forall(_._3 >= 0.0), "sMAPE is nonnegative")
  }

  test("dailyGapFilled: complete spine, conserved counts, LOCF staleness law") {
    val out = TimeSeries.dailyGapFilled(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))

    val ev = Tables(spark, dir, "events")
    val nTypes = ev.select("event_type").distinct().count()
    val nDays = ev.select(to_date(col("ts")).as("d")).distinct().count()
    assert(out.length == nTypes * nDays, "spine = types x calendar days")

    val sliceCount = ev.filter(col("value") >= TimeSeries.HighValue).count()
    assert(out.map(_._3).sum == sliceCount, "fill conserves the slice count")
    // the slice is sparse by construction — the spine must be doing real
    // filling, not passing an already-dense series through
    assert(out.count(_._3 == 0L) > 0, "at least one gap day exists")

    // LOCF law per type, in day order: stale == 0 on active days; on a gap
    // day it is previous + 1; NULL (-1) only before the first activity
    for ((_, rows) <- out.groupBy(_._1)) {
      var prev = -1L
      for ((_, _, n, stale) <- rows.sortBy(_._2)) {
        if (n > 0) assert(stale == 0L)
        else if (prev == -1L) assert(stale == -1L, "NULL before first activity")
        else assert(stale == prev + 1, "gap increments staleness")
        prev = stale
      }
    }
  }

  test("rollingDau7d equals a brute per-day window count") {
    val out = TimeSeries.rollingDau7d(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ud = Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        datediff(to_date(col("ts")), lit("2020-01-01").cast("date")).as("d"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val days = ud.map(x => (x._3, x._4)).distinct.sortBy(_._1)
    val brute = (for {
      t <- ud.map(_._1).distinct
      (dnum, dstr) <- days
    } yield {
      val users = ud.filter(u => u._1 == t && u._3 <= dnum && u._3 >= dnum - 6)
        .map(_._2).distinct.length
      (t, dstr) -> users.toLong
    }).filter(_._2 > 0).toMap
    assert(out == brute, "explode-cover equals the brute trailing window")
  }

  test("rollingDau7dHll tracks the exact twin within the sketch envelope") {
    val exact = TimeSeries.rollingDau7d(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = TimeSeries.rollingDau7dHll(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet, "sketch twin covers the same (type, day) cells")
    for ((k, e) <- exact) {
      val a = est(k)
      // lgK=12 HLL is EXACT in sparse mode at these cardinalities; 2% is
      // the generous envelope for the dense-mode regime a bigger SF enters
      assert(math.abs(a - e) <= math.max(1.0, 0.02 * e), s"$k: est $a vs exact $e")
    }
  }

  test("dailyCountAnomalies equals an exact BigInt re-derivation") {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val k = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val s2 = rows.map(r => BigInt(r._3) * r._3).sum
      rows.flatMap { case (_, day, n) =>
        val dev = k * n - s
        if (dev * dev > 4 * (k * s2 - s * s))
          Some((t, day, n, if (dev > 0) "high" else "low"))
        else None
      }
    }.toSet
    val out = TimeSeries.dailyCountAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(out == expected, "decimal-arithmetic flags equal the BigInt law")
    assert(out.nonEmpty, "the corpus plants at least one 2-sigma day")
  }

  test("ewmaDaily: seeds at the first observation and obeys the recurrence bit-for-bit") {
    val rows = TimeSeries.ewmaDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    for ((_, series) <- byType) {
      val ordered = series.sortBy(_._2)
      assert(ordered.head._4 == ordered.head._3.toDouble, "s_0 = x_0")
      // re-run the recurrence in plain scala doubles: the engine's fold
      // must match every intermediate EXACTLY (same op order, same IEEE
      // rounding) — not just within a tolerance
      var acc = ordered.head._3.toDouble
      for ((_, _, n, ewma) <- ordered.tail) {
        acc = 0.75 * acc + 0.25 * n.toDouble
        assert(ewma == acc, s"recurrence drift: got $ewma want $acc")
      }
    }
    // smoothing actually smooths: per-type variance of ewma < variance of n
    for ((_, series) <- byType if series.length > 5) {
      def variance(xs: Seq[Double]) = {
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / xs.length
      }
      assert(variance(series.map(_._4).toSeq) < variance(series.map(_._3.toDouble).toSeq))
    }
  }

  test("theilSenDailyTrend: lower median of pairwise slopes equals an in-memory re-derivation") {
    import org.apache.spark.sql.functions.{col, to_date, count, lit}
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val out = TimeSeries.theilSenDailyTrend(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    for ((t, medianRank, nPairs, slope) <- out) {
      val series = daily.filter(_._1 == t)
      val d0 = series.map(_._2).min
      val pts = series.map(s => (java.time.temporal.ChronoUnit.DAYS.between(d0, s._2), s._3))
      val slopes = (for {
        (i, n) <- pts; (j, m) <- pts if i < j
      } yield ((m - n).toDouble / (j - i), i, j)).sorted
      assert(nPairs == slopes.length)
      assert(nPairs == pts.length.toLong * (pts.length - 1) / 2)
      val want = slopes((nPairs.toInt + 1) / 2 - 1)._1
      assert(slope == want, s"$t sen slope $slope vs $want")
      assert(medianRank == (nPairs + 1) / 2)
    }
  }

  test("benfordAudit: digit counts re-derive; integer permille; all nine digits present") {
    import org.apache.spark.sql.functions.col
    val vals = Tables(spark, dir, "events")
      .select("value").collect().map(_.getDouble(0)).filter(_ >= 1.0)
    val byDigit = vals.groupBy(v => math.floor(v).toLong.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    val out = TimeSeries.benfordAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet == (1L to 9L).toSet, "every leading digit occurs")
    val total = vals.length.toLong
    for ((d, n, obs, ben) <- out) {
      assert(n == byDigit(d.toInt), s"digit $d count")
      assert(obs == 1000 * n / total)
      assert(ben == TimeSeries.BenfordPermille(d.toInt - 1))
    }
    // the heavy-tailed synthetic values lean low-digit, Benford-ish:
    // digit 1 must dominate digit 9
    val m = out.map(r => r._1 -> r._2).toMap
    assert(m(1L) > m(9L))
  }

  test("rollingDau7dBitmap equals the exact per-user rolling distinct everywhere") {
    val exact = TimeSeries.rollingDau7d(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val bitmap = TimeSeries.rollingDau7dBitmap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(bitmap == exact,
      "segment-bitmap popcount must equal the exact distinct count on every (type, day)")
    assert(bitmap.nonEmpty)
  }
  test("holtDaily: level/trend obey the double-smoothing recurrence bit-for-bit") {
    val rows = TimeSeries.holtDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(_._2)
      assert(ordered.head._4 == ordered.head._3.toDouble, "l_0 = x_0")
      assert(ordered.head._5 == 0.0, "b_0 = 0")
      var l = ordered.head._3.toDouble
      var b = 0.0
      for ((_, _, n, level, trend, fc) <- ordered.tail) {
        val nl = 0.25 * n.toDouble + 0.75 * (l + b)
        val nb = 0.25 * ((0.25 * n.toDouble + 0.75 * (l + b)) - l) + 0.75 * b
        l = nl; b = nb
        assert(level == l, s"level drift: got $level want $l")
        assert(trend == b, s"trend drift: got $trend want $b")
        assert(fc == l + b, "forecast_next = l + b")
      }
    }
    // the trend term reacts to a sustained ramp: on a monotone series the
    // one-step forecast must overshoot the flat EWMA forecast
    val clicks = rows.filter(_._1 == rows.head._1).sortBy(_._2)
    assert(clicks.exists(_._5 != 0.0), "trend never moved — series degenerate")
  }

  test("holtWintersDaily: level/trend/season obey the triple recurrence bit-for-bit") {
    val rows = TimeSeries.holtWintersDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(_._2)
      assert(ordered.head._4 == ordered.head._3.toDouble, "l_1 = x_1")
      assert(ordered.head._5 == 0.0 && ordered.head._6 == 0.0, "b_1 = s = 0")
      var l = ordered.head._3.toDouble
      var b = 0.0
      val s = Array.fill(7)(0.0)
      for (((_, _, n, level, trend, season, fc), p) <- ordered.tail.zipWithIndex) {
        val m = (p + 1) % 7 // 0-based step index of this row
        val nl = 0.25 * (n.toDouble - s(m)) + 0.75 * (l + b)
        val nb = 0.25 * (nl - l) + 0.75 * b
        s(m) = 0.3 * (n.toDouble - nl) + 0.7 * s(m)
        l = nl; b = nb
        assert(level == l, s"level drift: got $level want $l")
        assert(trend == b, s"trend drift: got $trend want $b")
        assert(season == s(m), s"season drift: got $season want ${s(m)}")
        assert(fc == l + b + s((p + 2) % 7), "forecast_next = l + b + next slot")
      }
      // the seasonal state must actually differentiate by weekday after
      // the warm-up week, else the third component is dead weight
      assert(ordered.drop(7).map(_._6).distinct.length > 1,
        "seasonal slots never diverged — series degenerate")
    }
  }

  test("weekdaySeasonality: index equals the exact integer-product ratio; mean is 1") {
    val rows = TimeSeries.weekdaySeasonality(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.forall(r => r._2 >= 0 && r._2 <= 6))
    for ((tp, g) <- rows.groupBy(_._1)) {
      val cntAll = g.map(_._3).sum
      val sumAll = g.map(_._4).sum
      for ((_, _, nd, tot, idx) <- g) {
        val want = (tot.toDouble * cntAll) / (nd.toDouble * sumAll)
        assert(math.abs(idx - want) < 1e-6, s"$tp idx $idx vs $want")
      }
      // n_days-weighted mean of the index telescopes to exactly 1
      val wmean = g.map(r => r._3 * r._5).sum / cntAll.toDouble
      assert(math.abs(wmean - 1.0) < 1e-6, s"$tp weighted mean $wmean != 1")
    }
    assert(rows.forall(_._5 > 0.0))
  }

  test("cusumChangepoints: prefix form equals the textbook max(0,·) recursion in BigInt") {
    val dir01 = "/root/testdata/sf0.01" // sf0.001 yields an empty alarm set
    val out = TimeSeries.cusumChangepoints(spark, dir01).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))

    // re-derive the daily series and frozen-baseline moments independently
    val daily = Tables(spark, dir01, "events")
      .groupBy(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val d0 = daily.map(_._2).min
    def dayNum(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val D = BigInt(TimeSeries.CusumSlackDen)
    val H2 = BigInt(TimeSeries.CusumH * TimeSeries.CusumH)
    val brute = scala.collection.mutable.ArrayBuffer[(String, String, Long, String)]()
    for ((t, rows) <- daily.groupBy(_._1).toSeq.sortBy(_._1)) {
      val (base, monitor) = rows.sortBy(_._2).partition(r =>
        dayNum(r._2) - dayNum(d0) < TimeSeries.CusumBaselineDays)
      if (base.nonEmpty) {
        val kb = BigInt(base.length)
        val sb = base.map(r => BigInt(r._3)).sum
        val s2b = base.map(r => BigInt(r._3) * BigInt(r._3)).sum
        val thr = H2 * D * D * (kb * s2b - sb * sb)
        var spos = BigInt(0); var sneg = BigInt(0)
        for ((_, day, n) <- monitor) {
          // textbook recursion on the D·kb-scaled centered series
          spos = (spos + D * kb * n - (D + 1) * sb).max(0)
          sneg = (sneg + (D - 1) * sb - D * kb * n).max(0)
          val hi = spos * spos > thr; val lo = sneg * sneg > thr
          if (hi || lo) brute += ((t, day, n,
            if (hi && lo) "both" else if (hi) "high" else "low"))
        }
      }
    }
    assert(out.nonEmpty, "sf0.01 must produce at least one alarm for the law to bite")
    assert(out.toSeq == brute.toSeq,
      "window prefix form must equal the max(0,·) recursion exactly")
    // the baseline is frozen: no alarm may fall inside the baseline window
    assert(out.forall(r => dayNum(r._2) - dayNum(d0) >= TimeSeries.CusumBaselineDays))
  }

}
