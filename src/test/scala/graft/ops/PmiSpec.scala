package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PmiSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("pmiPairs: ±2 window pair generation matches the positional definition") {
    // "a b c d": position pairs within distance 2 are
    // (a,b) (a,c) (b,c) (b,d) (c,d) — five unordered pairs, none equal
    import spark.implicits._
    val toks = Seq("a b c d").toDF("text")
      .select(Dedup.tokens(col("text")).as("tk"))
    val pairs = toks.select(explode(expr(
      """flatten(transform(tk, (x, i) ->
        |  transform(slice(tk, i + 2, 2),
        |    y -> struct(least(x, y) AS a, greatest(x, y) AS b))))""".stripMargin)).as("p"))
      .select("p.a", "p.b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.sorted.toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("pmiPairs: ratios descend, pairs canonical, counts above the floor") {
    val out = TextAnalysis.pmiPairs(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 100)
    for (r <- out) {
      assert(r.getString(0) < r.getString(1), s"non-canonical pair: $r")
      assert(r.getLong(2) >= 5, s"below min count: $r")
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(4) >= r.getLong(2),
        s"marginal below joint: $r")
    }
    val ratios = out.map(_.getDouble(5))
    assert(ratios.zip(ratios.tail).forall { case (x, y) => x >= y },
      "pmi_ratio not descending")
  }

  test("pmiPairs: a planted collocation outranks a stopword pair") {
    import spark.implicits._
    // "qz vx" always together (perfect collocation); "the" pairs with
    // everything (high marginals dilute its PMI)
    val docs = (0 until 30).map(i =>
      (i.toLong, s"the w$i qz vx m$i the")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("tk"))
    // reuse the registered query's core on this corpus via a temp view path:
    // easiest is to recompute with the same expressions inline
    val pairs = toks.select(explode(expr(
      """flatten(transform(tk, (x, i) ->
        |  transform(slice(tk, i + 2, 2),
        |    y -> struct(least(x, y) AS a, greatest(x, y) AS b))))""".stripMargin)).as("p"))
      .select("p.a", "p.b").filter(col("a") =!= col("b"))
    val cooc = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val ex = toks.select(explode(col("tk")).as("tok"))
    val marg = ex.groupBy("tok").agg(count(lit(1)).as("n"))
    val total = ex.count()
    val scored = cooc
      .join(marg.select(col("tok").as("a"), col("n").as("n_a")), Seq("a"))
      .join(marg.select(col("tok").as("b"), col("n").as("n_b")), Seq("b"))
      .select(col("a"), col("b"),
        ((col("n_ab") * lit(total)).cast("double") / (col("n_a") * col("n_b"))).as("r"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val planted = scored(("qz", "vx"))
    val stop = scored.filter { case ((a, b), _) => a == "the" || b == "the" }.values
    assert(stop.nonEmpty && stop.forall(planted > _),
      s"planted collocation $planted not above stopword pairs ${stop.max}")
  }

  test("docTopTokens: HOF pipeline equals a brute per-doc sort; plan has one shuffle (output sort)") {
    val df = TextAnalysis.docTopTokens(spark, dir)
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.size == docs.length)
    for ((id, text) <- docs.take(50)) {
      val want = text.toLowerCase.split("\\s+").distinct
        .sortBy(t => (-t.length, t)).take(3).mkString(" ")
      assert(out(id) == want, s"doc $id: '${out(id)}' vs '$want'")
    }
    // map-only except the output sort: no aggregate, no join, no explode
    val plan = df.queryExecution.executedPlan.toString
    for (op <- Seq("HashAggregate", "Join", "Generate"))
      assert(!plan.contains(op), s"HOF pipeline grew a $op:\n$plan")
  }

  test("vocabDivergence: scores ≥ 1, descending, symmetric in direction; OR re-derived") {
    val out = TextAnalysis.vocabDivergence(spark, dir, minCount = 5, k = 50).collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getDouble(3))
    assert(scores.forall(_ >= 1.0), "max(OR, 1/OR) < 1 is impossible")
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y }, "not descending")
    // re-derive the statistic for the returned rows from the totals over
    // the compared vocabulary (recompute counts independently)
    val byTok = Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.explode(
          Dedup.tokens(org.apache.spark.sql.functions.col("text"))).as("tok"))
      .collect()
      .map(r => (r.getString(0).filter(_.isDigit).toInt < 10, r.getString(1)))
    val counts = byTok.groupBy(_._2).view
      .mapValues(g => (g.count(_._1).toLong, g.count(!_._1).toLong))
      .filter { case (_, (a, b)) => a + b >= 5 }.toMap
    val na = counts.values.map(_._1).sum
    val nb = counts.values.map(_._2).sum
    for (r <- out.take(10)) {
      val (tok, sa, sb) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(counts(tok) == ((sa, sb)), s"$tok counts differ")
      val or = ((sa + 1) * (nb - sb + 1)).toDouble / ((sb + 1) * (na - sa + 1))
      val want = math.max(or, 1.0 / or)
      assert(math.abs(r.getDouble(3) - want) < 1e-12, s"$tok score off: ${r.getDouble(3)} vs $want")
    }
  }
}
