package graft.sources

import graft.SparkSuite
import graft.ops.Tables
import org.apache.spark.sql.functions._

class FileFormatsSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Append a raw line to the single part file, dropping the Hadoop
    * checksum sidecar the edit invalidates (the planted-corruption
    * fixture, not a production path). */
  private def plantLine(csvDir: String, line: String): Unit = {
    val f = new java.io.File(csvDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).head
    val w = new java.io.FileWriter(f, true)
    w.write(line + "\n"); w.close()
    val crc = new java.io.File(csvDir, s".${f.getName}.crc")
    if (crc.exists()) { crc.delete(); () }
  }

  test("CSV round trip is lossless against the parquet truth") {
    val events = Tables(spark, dir, "events")
    val out = tmp("csv_events")
    FileFormats.writeEventsCsv(events, out)
    val back = FileFormats.readEventsCsv(spark, out, events.schema)
      .drop("_corrupt_record")
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty,
      "CSV round trip altered rows")
  }

  test("PERMISSIVE quarantines a planted malformed line; FAILFAST aborts on it") {
    val events = Tables(spark, dir, "events").limit(10)
    val out = tmp("csv_bad")
    FileFormats.writeEventsCsv(events, out)
    plantLine(out, "not_a_number,garbage")

    val read = FileFormats.readEventsCsv(spark, out, events.schema).cache()
    val corrupt = read.filter(col("_corrupt_record").isNotNull).collect()
    assert(corrupt.length == 1, s"expected 1 corrupt row, got ${corrupt.length}")
    assert(corrupt.head.getAs[String]("_corrupt_record").startsWith("not_a_number"))
    assert(read.filter(col("_corrupt_record").isNull).count() == 10)
    read.unpersist()

    intercept[org.apache.spark.SparkException] {
      FileFormats.readEventsCsv(spark, out, events.schema, permissive = false)
        .collect()
    }
  }

  test("csvToParquet lands clean rows and quarantines the rest") {
    val events = Tables(spark, dir, "events").limit(20)
    val out = tmp("csv_land")
    FileFormats.writeEventsCsv(events, out)
    plantLine(out, "x,y,z")
    val (clean, corrupt) = FileFormats.csvToParquet(
      spark, out, events.schema, tmp("pq_clean"), tmp("pq_quarantine"))
    assert(clean == 20 && corrupt == 1, s"got ($clean, $corrupt)")
  }

  test("mergeSchema read: grown schema unions; pre-evolution rows carry typed nulls") {
    import spark.implicits._
    val base = tmp("evolve")
    Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "value")
      .write.parquet(s"$base/batch1")
    Seq((3L, 30.0, "mobile")).toDF("event_id", "value", "platform")
      .write.parquet(s"$base/batch2")
    val merged = FileFormats.readEvolved(spark, s"$base/batch1", s"$base/batch2")
    assert(merged.columns.sorted.toSeq == Seq("event_id", "platform", "value"))
    val rows = merged.orderBy("event_id").collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("platform"))),
      "pre-evolution rows should carry typed nulls")
    assert(rows(2).getAs[String]("platform") == "mobile")
  }

  test("ORC round trip is lossless and pushes predicates into the scan") {
    val events = Tables(spark, dir, "events")
    val out = tmp("orc_events")
    FileFormats.writeEventsOrc(events, out)
    val back = FileFormats.readEventsOrc(spark, out)
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty,
      "ORC round trip altered rows")
    val plan = back.filter(col("event_type") === "click")
      .select("event_id").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"predicate not pushed into the ORC scan:\n$plan")
  }

  test("binaryFile source ingests raw media files whole, with path/length metadata") {
    // the multimodal INGESTION source: each file arrives as one row of
    // (path, modificationTime, length, content) — the shape a decode
    // pipeline fans out over before any of the Multimodal operators run
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_bin")
    val payloads = Map(
      "a.png" -> Array.tabulate[Byte](256)(i => i.toByte),
      "b.wav" -> Array.fill[Byte](100)(7),
      "c.mp4" -> Array.tabulate[Byte](512)(i => (i * 31).toByte))
    for ((name, bytes) <- payloads)
      Files.write(Paths.get(dir.toString, name), bytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{png,wav,mp4}")
      .load(dir.toString)
    val rows = df.collect().map { r =>
      val p = r.getAs[String]("path")
      p.substring(p.lastIndexOf('/') + 1) ->
        (r.getAs[Long]("length"), r.getAs[Array[Byte]]("content"))
    }.toMap
    assert(rows.keySet == payloads.keySet)
    for ((name, bytes) <- payloads) {
      assert(rows(name)._1 == bytes.length.toLong, s"$name length")
      assert(java.util.Arrays.equals(rows(name)._2, bytes), s"$name content intact")
    }
    // and the source composes with the engine's own expressions: dHash the
    // binary content directly off the scan
    graft.GraftFunctions.register(spark)
    val fp = df.selectExpr("length", "md5(content) AS digest").collect()
    assert(fp.length == 3 && fp.forall(_.getString(1).length == 32))
  }
}
