package graft.pipeline

import java.nio.file.Files

import graft.SparkSuite

/** The four JSON envelope shapes the reference's loader accepts
  * (cleaner.py:124-143): top-level array, {"articles": [...]}, a single
  * object, and null/empty.
  */
class ArticleSchemaSpec extends SparkSuite {

  private def loadJson(content: String): Long = {
    val f = Files.createTempFile("graft-envelope", ".json")
    Files.writeString(f, content)
    ArticleSchema.load(spark, f.toString).count()
  }

  private val article =
    """{"title": "T", "content": "C", "url": "http://x", "published": "2025-01-01"}"""

  test("top-level array") {
    assert(loadJson(s"[$article, $article]") == 2)
  }

  test("articles wrapper object") {
    assert(loadJson(s"""{"articles": [$article, $article, $article]}""") == 3)
  }

  test("single object becomes one row") {
    assert(loadJson(article) == 1)
  }

  test("null and empty input yield zero rows") {
    assert(loadJson("null") == 0)
    assert(loadJson("") == 0)
    assert(loadJson("[]") == 0)
  }

  test("row_id preserves file order") {
    val f = Files.createTempFile("graft-order", ".json")
    Files.writeString(f,
      (1 to 5).map(i => s"""{"title": "t$i", "content": "c", "url": "u"}""")
        .mkString("[", ",", "]"))
    val titles = ArticleSchema.load(spark, f.toString)
      .orderBy("row_id").select("title")
      .collect().map(_.getString(0)).toSeq
    assert(titles == (1 to 5).map(i => s"t$i"))
  }
}
