package graft.pipeline

import graft.SparkSuite

class ArticlesSpec extends SparkSuite {

  private val sample =
    "/root/reference/week3assigment/week3-assignment/sample_data.json"

  test("typed load: all 17 records with case-class field access") {
    val ds = Articles.load(spark, sample)
    val rows = ds.collect()
    assert(rows.length == 17)
    assert(rows.count(_.title.isEmpty) >= 1) // the null-title record
  }

  test("typed cleanAndFlag: 7 pass, failures carry reasons") {
    val flagged = Articles.cleanAndFlag(spark, sample).collect()
    assert(flagged.length == 11)
    assert(flagged.count(_.passed) == 7)
    val failed = flagged.filterNot(_.passed)
    assert(failed.forall(f => f.reason.nonEmpty && f.errors.nonEmpty))
  }
}
