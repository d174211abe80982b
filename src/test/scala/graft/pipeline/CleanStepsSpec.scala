package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CleanStepsSpec extends SparkSuite {
  import spark.implicits._

  test("dropIncomplete removes rows with any blank required field") {
    val df = Seq(
      ("t1", "c1", "u1"),
      (null, "c2", "u2"),
      ("t3", "  ", "u3"),
      ("t4", "c4", ""),
      ("t5", "c5", "u5")
    ).toDF("title", "content", "url")
    val kept = CleanSteps.dropIncomplete(df).select("title").as[String].collect().toSet
    assert(kept == Set("t1", "t5"))
  }

  test("dropIncomplete skips absent columns silently") {
    val df = Seq(("t1", "c1"), (null, "c2")).toDF("title", "content")
    assert(CleanSteps.dropIncomplete(df).count() == 1) // url absent → only title/content enforced
  }

  test("dedupKeepFirst keeps the first occurrence in row_id order") {
    val df = Seq(
      (0L, "A", "u1", "first"),
      (1L, "B", "u2", "only"),
      (2L, "A", "u1", "second"),
      (3L, "A", "u1", "third"),
      (4L, "A", "u9", "different-url")
    ).toDF("row_id", "title", "url", "tag")
    val out = CleanSteps.dedupKeepFirst(df, Seq($"title", $"url"), $"row_id")
      .orderBy("row_id").select("tag").as[String].collect().toSeq
    assert(out == Seq("first", "only", "different-url"))
  }

  test("deduplicateArticles normalizes keys (re-clean is idempotent on cleaned data)") {
    val df = Seq(
      (0L, "AI &amp; ML", "https://e.com/a", "keep"),
      (1L, "AI & ML", "https://e.com/a", "dup-after-normalization"),
      (2L, "Other", "https://e.com/b", "keep2")
    ).toDF("row_id", "title", "url", "tag")
    val out = CleanSteps.deduplicateArticles(df).orderBy("row_id")
      .select("tag").as[String].collect().toSeq
    assert(out == Seq("keep", "keep2"))
  }

  test("deduplicateArticles is a no-op when title or url column missing") {
    val df = Seq((0L, "x"), (1L, "x")).toDF("row_id", "title")
    assert(CleanSteps.deduplicateArticles(df).count() == 2)
  }
}
