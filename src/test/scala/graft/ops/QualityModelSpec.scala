package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The LR quality classifier ([[QualityModel]]). Cross-engine exactness of
  * the served logits is the driver gate (`quality_lr_score` in
  * CORRECTNESS); these specs pin what the oracle can't see: the fit is
  * deterministic, the weights are finite, and the student actually learned
  * the teacher (beats the majority-class baseline, not just matches it).
  */
class QualityModelSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("conformalCalibration: q-hat and coverage equal a brute conformal walk") {
    import org.apache.spark.sql.functions._
    val out = QualityModel.conformalCalibration(spark, dir).collect().head
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        round(size(array_distinct(split(lower(col("text")), "\\s+")))
          .cast("double") / size(split(lower(col("text")), "\\s+")), 4).as("y"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def nib(id: Long): Char = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    val train = base.filter(d => nib(d._1) <= '9')
    val model = train.groupBy(_._2).map { case (l, rows) =>
      l -> rows.map(r => BigDecimal(r._3).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble./(rows.size)
    }
    def s(d: (Long, String, Double)) = math.abs(d._3 - model(d._2))
    val cal = base.filter(d => nib(d._1) >= 'a' && nib(d._1) <= 'd').map(s).sorted
    val k = math.ceil((cal.length + 1) * (1.0 - QualityModel.ConformalAlpha)).toLong
    val qhat = cal(k.toInt - 1)
    val ev = base.filter(d => nib(d._1) >= 'e').map(s)
    val covered = ev.count(_ <= qhat).toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((out.getLong(0), out.getDouble(1), out.getLong(2), out.getLong(3),
      out.getDouble(4)) ==
      ((cal.length.toLong, r6(qhat), ev.length.toLong, covered,
        r6(covered.toDouble / ev.length))),
      s"conformal walk diverges: $out")
    // the conformal guarantee is marginal over splits; on this fixed
    // split just pin that coverage is in a sane band around 1 - alpha
    assert(out.getDouble(4) >= 0.75 && covered <= ev.length)
  }

  test("IRLS fit is deterministic and finite") {
    val docs = Tables(spark, dir, "documents")
    val w1 = QualityModel.fitFrom(docs)
    val w2 = QualityModel.fitFrom(docs)
    assert(w1.toSeq == w2.toSeq, "re-fit must reproduce the weights bit-for-bit")
    assert(w1.length == 5 && w1.forall(v => !v.isNaN && !v.isInfinity),
      s"non-finite weights: ${w1.toSeq}")
  }

  test("fitLr separates a linearly separable toy problem") {
    // y = 1 iff x0 > 0.5; the fitted boundary must classify all of it
    val xs = (0 until 100).map(i =>
      Array(i / 100.0, 0.3, 0.3, 0.3)).toArray
    val ys = (0 until 100).map(i => if (i > 50) 1.0 else 0.0).toArray
    val w = QualityModel.fitLr(xs, ys)
    val acc = xs.zip(ys).count { case (x, y) =>
      val z = w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3) + w(4)
      (z > 0) == (y > 0.5)
    }
    assert(acc >= 98, s"separable toy accuracy $acc/100")
  }

  test("property: fitLr recovers random axis-aligned decision boundaries") {
    import org.scalacheck.Gen
    val rng = new scala.util.Random(7)
    val cuts = Gen.listOfN(5, Gen.choose(0.25, 0.75)).sample.get
    for ((cut, axis) <- cuts.zipWithIndex.map { case (c, i) => (c, i % 4) }) {
      val xs = Array.fill(400)(Array.fill(4)(rng.nextDouble()))
      val ys = xs.map(x => if (x(axis) > cut) 1.0 else 0.0)
      val w = QualityModel.fitLr(xs, ys)
      val acc = xs.zip(ys).count { case (x, y) =>
        val z = w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3) + w(4)
        (z > 0) == (y > 0.5)
      }
      assert(acc >= 380, s"axis $axis cut $cut: accuracy $acc/400")
    }
  }

  test("classifier agrees with the teacher above the majority baseline") {
    val lr = QualityModel.qualityLrScore(spark, dir).select("doc_id", "keep")
    val teacher = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), (col("quality") >= 0.75).as("t"))
    val j = lr.join(teacher, "doc_id").cache()
    val n = j.count().toDouble
    val agree = j.filter(col("keep") === col("t")).count() / n
    val share = j.filter(col("t")).count() / n
    val majority = math.max(share, 1 - share)
    info(f"agreement $agree%.3f, teacher-positive share $share%.3f")
    assert(agree >= 0.85, f"agreement $agree%.3f below floor")
    assert(agree > majority,
      f"agreement $agree%.3f does not beat the majority baseline $majority%.3f — model learned nothing")
    j.unpersist()
  }

  test("quality-weighted sample: deterministic, rate tracks mean keep probability, ramp bounded") {
    val a = QualityModel.qualityWeightedSample(spark, dir).collect()
    val b = QualityModel.qualityWeightedSample(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "kept set must be a pure function of (seed, key)")
    assert(a.forall(r => r.getDouble(1) >= 0.1 && r.getDouble(1) <= 1.0), "ramp left [0.1, 1.0]")
    // empirical keep rate within binomial noise of the mean ramp value
    val w = QualityModel.fitCached(spark, dir)
    val total = Tables(spark, dir, "documents").count().toDouble
    val meanP = Tables(spark, dir, "documents")
      .select(avg(greatest(least(lit(0.5) + QualityModel.logitCol(w) / 4.0, lit(1.0)), lit(0.1))))
      .head().getDouble(0)
    val rate = a.length / total
    info(f"keep rate $rate%.3f vs mean ramp $meanP%.3f over ${total.toInt} docs")
    // 4σ binomial bound at p≈meanP
    val bound = 4 * math.sqrt(meanP * (1 - meanP) / total)
    assert(math.abs(rate - meanP) < bound + 0.01,
      f"keep rate $rate%.3f departs from mean ramp $meanP%.3f beyond noise")
  }

  test("served keep equals the raw logit sign recomputed driver-side") {
    val w = QualityModel.fitCached(spark, dir)
    val served = QualityModel.qualityLrScore(spark, dir).limit(50).collect()
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stop = TextAnalysis.Stopwords.head._2.toSet
    for (r <- served) {
      val t = texts(r.getLong(0)).toLowerCase.split("\\s+", -1)
      val nTok = t.length.toDouble
      val x = Array(
        nTok / QualityModel.TokScale,
        t.distinct.length.toDouble / nTok,
        t.map(_.length.toLong).sum.toDouble / nTok / QualityModel.LenScale,
        t.toSet.count(stop).toDouble / QualityModel.StopScale)
      val z = w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3) + w(4)
      assert(r.getBoolean(2) == (z > 0),
        s"doc ${r.getLong(0)}: served keep ${r.getBoolean(2)} vs recomputed logit $z")
    }
  }

  test("lrEvalMetrics: cells re-derive from the served scores and teacher; metrics consistent") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val m = QualityModel.lrEvalMetrics(spark, dir).collect()(0)
    val (tp, fp, tn, fn) = (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))

    // independent cell derivation: served keep (quality_lr_score) against
    // the heuristic label (quality >= 0.75 == ruleHits >= 3)
    val pred = QualityModel.qualityLrScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val teach = TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(5) >= 0.75)).toMap
    assert(pred.keySet == teach.keySet)
    def cell(y: Boolean, p: Boolean) =
      pred.keys.count(k => teach(k) == y && pred(k) == p).toLong
    assert((tp, fp, tn, fn) == (cell(true, true), cell(false, true),
      cell(false, false), cell(true, false)), "confusion cells re-derive")

    val n = (tp + fp + tn + fn).toDouble
    assert(n == pred.size.toDouble)
    assert(math.abs(m.getDouble(4) - (tp + tn) / n) < 1e-12, "accuracy")
    assert(math.abs(m.getDouble(7) - 2.0 * tp / (2.0 * tp + fp + fn)) < 1e-12, "f1")
    // the distilled student must beat always-predict-majority — else the
    // metrics row is reporting a degenerate model
    val majority = math.max(teach.values.count(identity), teach.values.count(!_)) / n
    assert(m.getDouble(4) > majority, s"accuracy ${m.getDouble(4)} vs majority $majority")
  }

  test("dsirWeights: target-vocabulary documents outscore disjoint-vocabulary ones") {
    val sparkS = spark
    import sparkS.implicits._
    // target slice speaks {alpha, beta}; the raw remainder speaks
    // {gamma, delta}; one probe doc of each vocabulary sits in the raw
    // slice — DSIR must rank the target-sounding probe above the other
    val docs = Seq(
      (1L, "tgt", "alpha beta alpha beta alpha"),
      (2L, "tgt", "beta alpha beta alpha beta"),
      (3L, "raw", "gamma delta gamma delta gamma"),
      (4L, "raw", "delta gamma delta gamma delta"),
      (5L, "raw", "alpha beta alpha beta"),   // target-sounding probe
      (6L, "raw", "gamma delta gamma delta")  // raw-sounding probe
    ).toDF("doc_id", "source", "text")
    val w = graft.ops.QualityModel.dsirWeightsOf(docs, "tgt").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(w(5L)._1 == 4 && w(6L)._1 == 4)
    assert(w(5L)._2 > w(6L)._2,
      s"target-sounding probe ${w(5L)._2} must outscore raw-sounding ${w(6L)._2}")
    assert(w(1L)._2 > 0 && w(3L)._2 < 0,
      s"pure-target doc ${w(1L)._2} should be positive, pure-raw ${w(3L)._2} negative")
  }

  test("dsirWeights on testdata: per-doc token counts re-derive; target slice mean is highest") {
    val out = graft.ops.QualityModel.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), size(split(lower(col("text")), "\\s+")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.size == docs.length)
    for ((id, _, n) <- docs) assert(out(id)._1 == n.toLong, s"doc $id token count")
    // the re-weighting is toward the target slice: its docs' mean weight
    // must exceed the overall mean (which is ~0 by construction)
    val bySrc = docs.groupBy(_._2).view.mapValues(_.map(d => out(d._1)._2))
    val tgtMean = bySrc(graft.ops.QualityModel.DsirTargetSource).sum /
      bySrc(graft.ops.QualityModel.DsirTargetSource).size
    val allW = docs.map(d => out(d._1)._2)
    assert(tgtMean > allW.sum / allW.size,
      s"target-slice mean $tgtMean not above corpus mean ${allW.sum / allW.size}")
  }

  test("lrCalibrationBins: bins partition the corpus; conf inside bin bounds; gap re-derives") {
    val out = graft.ops.QualityModel.lrCalibrationBins(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val nDocs = graft.ops.Tables(spark, dir, "documents").count()
    assert(out.map(_._2).sum == nDocs, "bins must partition every document")
    for ((bin, n, nPos, conf, acc, gap) <- out) {
      assert(bin >= 1 && bin <= 9, s"ramp clamps p to [0.1, 1] → bins 1..9, got $bin")
      // bin 9 also holds the clamp's p = 1.0 mass, so its upper bound is
      // inclusive; every bin's mean must sit inside its own decile
      val (lo, hi) = (bin / 10.0, if (bin == 9) 1.0 + 1e-9 else (bin + 1) / 10.0)
      assert(conf >= lo - 1e-9 && conf < hi, s"bin $bin conf $conf outside [$lo, $hi)")
      assert(nPos <= n)
      assert(math.abs(gap - math.abs(conf - acc)) < 2e-6,
        s"bin $bin gap $gap vs |conf-acc| ${math.abs(conf - acc)}")
    }
  }
}
