package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextClean.isBlank

case class ReasonCount(reason: String, count: Long, firstRowId: Long)
case class FailedDetail(index: Long, reason: String, message: String)
case class DateRange(earliest: Option[Timestamp], latest: Option[Timestamp], withDate: Long)

/** Everything the quality/validation reports need (reference O10–O14). */
case class QualityStats(
    originalCount: Long,
    cleanedCount: Long,
    deletedIncomplete: Long,
    deletedDuplicates: Long,
    passed: Long,
    failed: Long,
    completeness: Seq[(String, Long)], // data column -> non-blank count, in column order
    reasons: Seq[ReasonCount],         // count desc, first-occurrence asc (= Counter.most_common)
    failedDetails: Seq[FailedDetail],
    dateRange: Option[DateRange]) {
  def total: Long = cleanedCount
  def passRate: Double = if (total > 0) passed.toDouble / total * 100 else 0.0
  def retentionPct: Double = if (originalCount > 0) cleanedCount.toDouble / originalCount * 100 else 0.0
  def validPct: Double = if (originalCount > 0) passed.toDouble / originalCount * 100 else 0.0
}

/** Batch statistics (reference O10–O14, validator.py:144-166 +
  * cleaner.py:193-242).
  *
  * The reference makes one pandas pass per metric (a per-column loop for
  * completeness, an `iterrows` loop for validation). Here the counts,
  * per-column completeness, and the date range all collapse into ONE
  * partial+final hash aggregate over a single scan; only the (small) reason
  * histogram and failure-detail listing are separate jobs. Call on a cached
  * flagged frame.
  */
object Stats {

  private val metaCols = Set("row_id", "errors", "passed", "reason", "message")

  def collect(
      flagged: DataFrame,
      originalCount: Long,
      deletedIncomplete: Long,
      deletedDuplicates: Long,
      includeFailedDetails: Boolean = true,
      maxFailedDetails: Long = 10000): QualityStats = {

    val dataCols = flagged.columns.filterNot(metaCols.contains)
    val dateCol = Seq("published_date", "published").find(flagged.columns.contains)

    // --- single-pass multi-aggregate: counts + completeness + date range ---
    val baseAggs = Seq(
      count(lit(1)).as("_total"),
      count(when(col("passed"), 1)).as("_passed"))
    // O13 semantics note: null counts as MISSING here (intended semantics,
    // README "empty/None/whitespace"). The reference's live behavior differs:
    // its astype(str) cast turns null into the literal "None", so its golden
    // report shows published_date at 100% where this reports 90.9% — a
    // documented deviation (SURVEY.md §0 item 2 / H3), pinned in
    // GoldenPipelineSpec.
    val complAggs = dataCols.toSeq.map(c =>
      count(when(!isBlank(col(c).cast("string")), 1)).as(s"_ok_$c"))
    val dateAggs = dateCol.toSeq.flatMap { c =>
      // report re-parses with pandas to_datetime(errors="coerce"); the column
      // holds ISO strings (or raw `published`), so a try-parse chain suffices
      val ts = Dates.parseTimestamp(col(c))
      Seq(min(ts).as("_d_min"), max(ts).as("_d_max"), count(ts).as("_d_n"))
    }
    val aggs = baseAggs ++ complAggs ++ dateAggs
    val row = flagged.agg(aggs.head, aggs.tail: _*).head()

    val total = row.getAs[Long]("_total")
    val passed = row.getAs[Long]("_passed")
    val completeness = dataCols.toSeq.map(c => c -> row.getAs[Long](s"_ok_$c"))
    val dateRange = dateCol.map { _ =>
      DateRange(
        Option(row.getAs[Timestamp]("_d_min")),
        Option(row.getAs[Timestamp]("_d_max")),
        row.getAs[Long]("_d_n"))
    }

    // --- reason histogram (O11): count desc, ties by first occurrence, which
    // reproduces Counter.most_common()'s stable insertion-order ties ---
    val reasons = flagged.filter(!col("passed"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n"), min("row_id").as("first_row"))
      .orderBy(col("n").desc, col("first_row").asc)
      .collect()
      .map(r => ReasonCount(r.getAs[String]("reason"), r.getAs[Long]("n"), r.getAs[Long]("first_row")))
      .toSeq

    // --- failure details (O10): positional index in the cleaned frame, as the
    // reference reports (SURVEY.md H2). Computed WITHOUT a global window
    // (which would funnel every row through one partition): filter first,
    // then count each failed row's predecessors via a broadcast nested-loop
    // join — map-side partial aggregation emits ≤ |failed| rows per input
    // partition. The NLJ does |rows| × |failed| comparisons, so the listing
    // is gated on |failed| ≤ maxFailedDetails: a report that would print
    // >10k per-row lines is useless anyway, and past the cap the scalable
    // answer is a side sink keyed by row_id, not a report section.
    val failedDetails =
      if (!includeFailedDetails || (total - passed) > maxFailedDetails) Seq.empty
      else {
        val failed = flagged.filter(!col("passed"))
          .select(col("row_id"), col("reason"), col("message"))
        val preceding = flagged.select(col("row_id").as("_all_id"))
          .join(broadcast(failed.select(col("row_id").as("_f_id"))),
            col("_all_id") < col("_f_id"))
          .groupBy(col("_f_id")).agg(count(lit(1)).as("_idx"))
        failed.join(preceding, col("row_id") === col("_f_id"), "left")
          .select(coalesce(col("_idx"), lit(0L)).as("_idx"),
            col("reason"), col("message"))
          .orderBy("_idx")
          .collect()
          .map(r => FailedDetail(r.getLong(0), r.getString(1), r.getString(2)))
          .toSeq
      }

    QualityStats(
      originalCount = originalCount,
      cleanedCount = total,
      deletedIncomplete = deletedIncomplete,
      deletedDuplicates = deletedDuplicates,
      passed = passed,
      failed = total - passed,
      completeness = completeness,
      reasons = reasons,
      failedDetails = failedDetails,
      dateRange = dateRange)
  }
}
