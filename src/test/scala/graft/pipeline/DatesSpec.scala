package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Date-format corpus from FIXTURES.md §3 — every shape the reference's
  * dateutil-based parser sees, verified against dateutil behavior.
  */
class DatesSpec extends SparkSuite {
  import spark.implicits._

  private def parse(values: Seq[String]): Seq[Option[String]] =
    values.toDF("s").select(Dates.parseIsoDate($"s").as("d"))
      .as[Option[String]].collect().toSeq

  test("ISO timestamps pass through") {
    assert(parse(Seq("2025-02-20T14:30:00Z")) == Seq(Some("2025-02-20T14:30:00Z")))
  }

  test("month-name formats") {
    assert(parse(Seq("Jan 15, 2025", "March 1, 2025", "May 5, 2025", "Aug 1, 2025", "August 10, 2025")) ==
      Seq(Some("2025-01-15T00:00:00Z"), Some("2025-03-01T00:00:00Z"),
        Some("2025-05-05T00:00:00Z"), Some("2025-08-01T00:00:00Z"),
        Some("2025-08-10T00:00:00Z")))
  }

  test("slash dates: month-first, day-first fallback (dateutil rules)") {
    assert(parse(Seq("15/03/2025", "05/03/2025")) ==
      Seq(Some("2025-03-15T00:00:00Z"), Some("2025-05-03T00:00:00Z")))
  }

  test("ordinal suffix and Sept abbreviation") {
    assert(parse(Seq("July 1st, 2025", "Sept 15, 2025", "June 22nd, 2025")) ==
      Seq(Some("2025-07-01T00:00:00Z"), Some("2025-09-15T00:00:00Z"),
        Some("2025-06-22T00:00:00Z")))
  }

  test("invalid dates → null") {
    assert(parse(Seq("2025-13-99", "13/14/2025", "2025-02-29", "not a date")) ==
      Seq(None, None, None, None))
  }

  test("blank and sentinel strings → null (cleaner.py:64 semantics)") {
    assert(parse(Seq(null, "", "  ", "none", "NULL", "NaN")) ==
      Seq(None, None, None, None, None, None))
  }
}
