package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** End-to-end golden test against the reference's own fixture and output:
  * sample_data.json (17 adversarial records) → cleaned_output.json (7
  * records, byte-stable across reference environments — SURVEY.md §0).
  * Funnel counts pinned to the *intended* semantics (null = missing), which
  * match the checked-in golden report: 17 → 4 incomplete → 2 dupes → 11
  * cleaned → 7 passed / 4 failed (SURVEY.md H3).
  */
class GoldenPipelineSpec extends SparkSuite {

  private val refDir = "/root/reference/week3assigment/week3-assignment"

  private def rowsOf(df: DataFrame): Seq[Map[String, String]] = {
    val cols = df.columns.sorted.toSeq
    df.collect().toSeq.map { r =>
      cols.flatMap(c => Option(r.getAs[Any](c)).map(v => c -> v.toString)).toMap
    }
  }

  test("pipeline reproduces the reference's cleaned_output.json and funnel") {
    val outDir = Files.createTempDirectory("graft-golden").toString
    val outJson = s"$outDir/cleaned_output.json"
    val outReport = s"$outDir/quality_report.txt"

    val result = ArticlePipeline.run(
      spark, s"$refDir/sample_data.json", outJson, outReport, prettyArray = true)

    // --- funnel ---
    val s = result.stats
    assert(s.originalCount == 17)
    assert(s.deletedIncomplete == 4)
    assert(s.deletedDuplicates == 2)
    assert(s.cleanedCount == 11)
    assert(s.passed == 7)
    assert(s.failed == 4)
    assert(math.abs(s.passRate - 63.6) < 0.1)
    assert(math.abs(s.validPct - 41.2) < 0.1)

    // --- failure distribution: 2 short_content + 2 invalid_url (golden) ---
    assert(s.reasons.map(r => r.reason -> r.count).toMap ==
      Map("short_content" -> 2L, "invalid_url" -> 2L))

    // --- date coverage: 10/11 valid, 2025-01-15 → 2025-09-15 ---
    val dr = s.dateRange.get
    assert(dr.withDate == 10)
    assert(dr.earliest.get.toInstant.toString.startsWith("2025-01-15"))
    assert(dr.latest.get.toInstant.toString.startsWith("2025-09-15"))

    // --- golden output: parsed-JSON equality, in order ---
    val golden = spark.read.option("multiLine", true).json(s"$refDir/cleaned_output.json")
    val ours = spark.read.option("multiLine", true).json(outJson)
    assert(ours.count() == 7)
    val gRows = rowsOf(golden)
    val oRows = rowsOf(ours)
    assert(oRows == gRows)
  }

  test("report contains the stable golden metrics lines") {
    val outDir = Files.createTempDirectory("graft-golden2").toString
    val result = ArticlePipeline.run(
      spark, s"$refDir/sample_data.json", s"$outDir/out.json", s"$outDir/report.txt")
    val rep = result.report
    assert(rep.contains("Total records processed:   17"))
    assert(rep.contains("Cleaned record count:      11"))
    assert(rep.contains("    - Missing (incomplete):  4"))
    assert(rep.contains("    - Duplicates:            2"))
    assert(rep.contains("Total validation passed:   7"))
    assert(rep.contains("Pass rate:                 63.6%"))
    assert(rep.contains("End-to-end retention:  41.2% (7/17 records saved)"))
    assert(rep.contains("Earliest:  2025-01-15 00:00:00"))
    assert(rep.contains("Latest:    2025-09-15 00:00:00"))
    assert(rep.contains("Records with date: 10/11"))

    // Completeness: INTENDED semantics — null counts as missing, so the
    // unparseable-date row leaves published_date at 10/11 = 90.9%. The
    // checked-in reference golden says 100.0% only because its pandas
    // astype(str) turned null into the literal string "None" (stale-pandas
    // artifact, SURVEY.md §0 item 2 / H3) — a deliberate deviation.
    assert(rep.contains("published_date              90.9%  (10/11)"))
    assert(rep.contains("title                      100.0%  (11/11)"))
  }

  test("full report is line-identical to the checked-in golden except the two pandas artifacts") {
    val outDir = Files.createTempDirectory("graft-golden3").toString
    val result = ArticlePipeline.run(
      spark, s"$refDir/sample_data.json", s"$outDir/out.json", s"$outDir/report.txt")
    // golden is CRLF; normalize endings, compare line-by-line
    val golden = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$refDir/quality_report.txt")), "UTF-8")
      .replace("\r\n", "\n").split("\n", -1).toSeq
    val ours = result.report.split("\n", -1).toSeq
    assert(ours.length == golden.length,
      s"report has ${ours.length} lines, golden has ${golden.length}")
    val diffs = golden.zip(ours).zipWithIndex.collect {
      case ((g, o), i) if g != o => (i, g, o)
    }
    // exactly two known divergences, both traced to the reference's pandas
    // astype(str) null-sentinel artifact (SURVEY.md §0 item 2):
    //  - published_date completeness (100.0% golden vs 90.9% intended)
    //  - the invalid-url failed record carries an extra trailing
    //    "Published date is missing or empty." in the golden
    assert(diffs.length == 2, s"unexpected report divergences: $diffs")
    assert(diffs(0)._2.contains("published_date") && diffs(0)._2.contains("100.0%"))
    assert(diffs(0)._3.contains("published_date") && diffs(0)._3.contains("90.9%"))
    assert(diffs(1)._2 ==
      diffs(1)._3 + " Published date is missing or empty.")
  }

  test("report file is byte-identical to the checked-in expected rendering") {
    // strict parity mode: the WRITTEN report file must reproduce
    // src/test/resources/expected_quality_report.txt byte-for-byte. The
    // expected file is the reference golden with ONLY the two documented
    // pandas-artifact lines corrected (the line-diff test above pins that
    // relationship) — so this test freezes the full rendering: every
    // header, padding width, percent format, and blank line.
    val outDir = Files.createTempDirectory("graft-golden4").toString
    val reportPath = s"$outDir/report.txt"
    ArticlePipeline.run(
      spark, s"$refDir/sample_data.json", s"$outDir/out.json", reportPath)
    val expected = new String(Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/expected_quality_report.txt").toURI)), "UTF-8")
    val written = new String(Files.readAllBytes(
      java.nio.file.Paths.get(reportPath)), "UTF-8")
    assert(written == expected,
      "rendered quality report deviates from the checked-in expected bytes")
  }
}
