package graft.ops

import graft.SparkSuite

class SamplingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("hash split is deterministic and ~25% test") {
    val a = Sampling.splitCounts(spark, dir).collect().toSeq
    val b = Sampling.splitCounts(spark, dir).collect().toSeq
    assert(a == b)
    val total = a.map(_.getLong(2)).sum
    val test = a.filter(_.getString(1) == "test").map(_.getLong(2)).sum
    val frac = test.toDouble / total
    assert(frac > 0.10 && frac < 0.40, s"test fraction $frac far from 25%")
  }

  test("stratified sample: deterministic for a seed, fractions roughly honored") {
    val s1 = Sampling.stratifiedSample(spark, dir).collect().toSeq
    val s2 = Sampling.stratifiedSample(spark, dir).collect().toSeq
    assert(s1 == s2)
    val total = Tables(spark, dir, "documents").count()
    val frac = s1.size.toDouble / total
    assert(frac > 0.3 && frac < 0.7, s"sample fraction $frac far from 0.5")
  }
}
