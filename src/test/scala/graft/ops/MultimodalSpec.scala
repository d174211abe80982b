package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("mediaTable: binary payload + typed metadata struct, one row per doc") {
    val media = Multimodal.mediaTable(spark, dir)
    assert(media.schema("payload").dataType == BinaryType)
    val metaFields = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(metaFields == Seq("mime", "n_bytes"))
    val docs = Tables(spark, dir, "documents").count()
    assert(media.count() == docs)
    // payload really is the text bytes
    val row = media.select(col("payload"), col("meta.n_bytes")).head()
    assert(row.getAs[Array[Byte]](0).length == row.getAs[Int](1))
  }

  test("frameSample: every k-th fixed-width slice, never exceeding the payload") {
    val frames = Multimodal.frameSample(spark, dir, every = 4).cache()
    val bad = frames.filter(
      length(col("frame")) > Multimodal.FrameBytes ||
      col("frame_idx") % 4 =!= 0).count()
    assert(bad == 0)
    // a doc with n_bytes bytes yields ceil(ceil(n/64)/4) sampled frames
    val perDoc = frames.groupBy("doc_id").count()
      .join(Multimodal.mediaTable(spark, dir).select(col("doc_id"), col("meta.n_bytes").as("n")), "doc_id")
      .withColumn("expected", ceil(ceil(col("n") / Multimodal.FrameBytes) / 4))
      .filter(col("count") =!= col("expected"))
    assert(perDoc.count() == 0)
    frames.unpersist()
  }

  test("extractFeatures: fixed-dim vectors, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(spark, dir, dim = 8)
    assert(f1.schema("feature").dataType == ArrayType(FloatType, containsNull = false))
    val rows = f1.collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[Float](2).length == 8))
    val f2 = Multimodal.extractFeatures(spark, dir, dim = 8).collect()
    assert(rows.map(_.toString).toSeq == f2.map(_.toString).toSeq)
  }

  test("mediaStats: modality partition of all docs, byte totals consistent") {
    val stats = Multimodal.mediaStats(spark, dir).collect()
    assert(stats.map(_.getAs[String]("mime")).toSeq ==
      Multimodal.Modalities.sorted)
    val docs = Tables(spark, dir, "documents").count()
    assert(stats.map(_.getAs[Long]("n")).sum == docs)
  }
}
