package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType}

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
    val f1 = Multimodal.extractFeatures(spark, dir)
    assert(f1.schema("feature").dataType == ArrayType(DoubleType, containsNull = false))
    val rows = f1.orderBy("doc_id").collect()
    assert(rows.nonEmpty &&
      rows.forall(_.getSeq[Double](2).length == Multimodal.FeatureCodec.OutDims))
    val f2 = Multimodal.extractFeatures(spark, dir).orderBy("doc_id").collect()
    assert(rows.map(_.toString).toSeq == f2.map(_.toString).toSeq)
  }

  test("FeatureCodec.decode: histogram shares sum to 1, window means bounded, empty-safe") {
    val payload = "The quick brown fox jumps over the lazy dog, twice over.".getBytes("UTF-8")
    val raw = Multimodal.FeatureCodec.decode(payload)
    assert(raw.length == Multimodal.FeatureCodec.RawDims)
    val histSum = raw.take(16).sum
    assert(math.abs(histSum - 1.0) < 1e-9, s"histogram shares sum $histSum")
    assert(raw.drop(16).forall(v => v >= 0.0 && v <= 1.0))
    // content-sensitivity: a different payload yields a different descriptor
    val other = Multimodal.FeatureCodec.decode("entirely different bytes!!!!!!".getBytes("UTF-8"))
    assert(!java.util.Arrays.equals(raw, other))
    assert(Multimodal.FeatureCodec.decode(Array.empty[Byte]).forall(_ == 0.0))
    assert(Multimodal.FeatureCodec.decode(null).forall(_ == 0.0))
  }

  test("property: decode invariants hold on random payloads; projecting the mean is exactly zero") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(200, Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)))
    val payloads = gen.sample.get
    for (p <- payloads) {
      val raw = Multimodal.FeatureCodec.decode(p)
      assert(raw.length == Multimodal.FeatureCodec.RawDims)
      if (p.nonEmpty) {
        assert(math.abs(raw.take(16).sum - 1.0) < 1e-9, "histogram shares must sum to 1")
        assert(raw.drop(16).forall(v => v >= 0.0 && v <= 1.0), "window means out of [0,1]")
      } else assert(raw.forall(_ == 0.0))
    }
    // the projection is centered: feeding the mean itself back through
    // project gives EXACT zeros ((m_i - m_i)·w_i terms are all +0.0)
    val sample = payloads.filter(_.nonEmpty).map(Multimodal.FeatureCodec.decode)
    if (sample.length > 1) {
      val (mean, comps) = Multimodal.fitPca(sample.toArray, Multimodal.FeatureCodec.OutDims)
      assert(Multimodal.FeatureCodec.project(mean, mean, comps).forall(_ == 0.0))
    }
  }

  test("fitPca: deterministic, components unit-norm and pairwise orthogonal, variance-ordered") {
    val media = Multimodal.mediaTable(spark, dir).select(col("doc_id"), col("payload"))
    val (mean1, comps1) = Multimodal.fitPcaFrom(media)
    val (mean2, comps2) = Multimodal.fitPcaFrom(media)
    assert(mean1.toSeq == mean2.toSeq && comps1.map(_.toSeq).toSeq == comps2.map(_.toSeq).toSeq,
      "re-fit must reproduce the model bit-for-bit")
    for (c <- comps1) {
      val nrm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"component norm $nrm")
    }
    for (a <- comps1.indices; b <- comps1.indices if a < b) {
      val d = comps1(a).zip(comps1(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d) < 1e-6, s"components $a,$b not orthogonal: $d")
    }
    // explained variance must be non-increasing across components (Jacobi
    // eigenvalues sorted descending); recompute over the SAME hash-thinned
    // sample the fit used — eigen-order holds for the fit distribution, not
    // for the unsampled table when eigenvalues are clustered
    val sample = media
      .filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0)
      .collect().map(r =>
        Multimodal.FeatureCodec.decode(r.getAs[Array[Byte]]("payload")))
    def varAlong(c: Array[Double]): Double = {
      val proj = sample.map(v =>
        v.indices.map(i => (v(i) - mean1(i)) * c(i)).sum)
      val m = proj.sum / proj.length
      proj.map(p => (p - m) * (p - m)).sum / proj.length
    }
    val vars = comps1.map(varAlong)
    for (i <- 1 until vars.length)
      assert(vars(i) <= vars(i - 1) * (1 + 1e-9) + 1e-12,
        s"variance not descending at $i: ${vars.toSeq}")
    assert(vars.head > 0.0, "leading component captures no variance — degenerate fit")
  }

  test("extractFeatures: projection matches a direct driver-side recomputation") {
    val (mean, comps) = Multimodal.fitPcaCached(spark, dir)
    val got = Multimodal.extractFeatures(spark, dir).orderBy("doc_id").limit(20).collect()
    val payloads = Multimodal.mediaTable(spark, dir)
      .select(col("doc_id"), col("payload")).orderBy("doc_id").limit(20).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for (r <- got) {
      val expect = Multimodal.FeatureCodec.project(
        Multimodal.FeatureCodec.decode(payloads(r.getLong(0))), mean, comps)
      assert(r.getSeq[Double](2) == expect.toSeq, s"doc ${r.getLong(0)} mismatch")
    }
  }

  test("DHash64: ramp payload sets every bit, constant payload none") {
    import spark.implicits._
    // 130 bytes, 2 per window, strictly increasing → every window mean
    // exceeds its predecessor → all 64 comparison bits set → fp == -1L
    val ramp = Array.tabulate[Byte](130)(i => i.toByte)
    val flat = Array.fill[Byte](130)(7)
    val df = Seq((1L, ramp), (2L, flat), (3L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), graft.functions.DHash64(col("payload")).as("fp"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == -1L, s"ramp fingerprint ${got(1L)}")
    assert(got(2L) == 0L)
    assert(got(3L) == 0L)
  }

  test("mediaNearDup: planted perturbed duplicates are recalled, distinct media are not paired") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // three unrelated 1300-byte payloads + a lightly perturbed copy of each
    // (3 bytes nudged by +5 — window means move < 1, so dHash flips at most
    // the adjacent comparison bits)
    val bases = (0 until 3).map { i =>
      (i.toLong, Array.fill[Byte](1300)((rng.nextInt(64) + 32).toByte))
    }
    val dups = bases.map { case (id, b) =>
      val c = b.clone()
      Seq(100, 600, 1100).foreach(p => c(p) = (c(p) + 5).toByte)
      (id + 10, c)
    }
    val media = (bases ++ dups).toDF("doc_id", "payload")
    val pairs = Multimodal.mediaNearDupFrom(media, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (base, perturbed) pair recalled…
    for (id <- 0L until 3L)
      assert(pairs.contains((id, id + 10)), s"planted pair ($id, ${id + 10}) missed: $pairs")
    // …and no pair joins two different base payloads
    val crossFamily = pairs.filter { case (a, b) => b % 10 != a % 10 }
    assert(crossFamily.isEmpty, s"unrelated media paired: $crossFamily")
  }

  test("media_near_dup: every doc pairs with its planted exact twin at hamming 0") {
    val docs = Tables(spark, dir, "documents").count()
    val shift = Tables(spark, dir, "documents")
      .agg(max(col("doc_id"))).head.getLong(0) + 1L
    val pairs = Multimodal.mediaNearDup(spark, dir).cache()
    val exact = pairs
      .filter(col("b_id") === col("a_id") + shift && col("hamming") === 0)
      .count()
    assert(exact == docs, s"$exact of $docs planted twins found")
    pairs.unpersist()
  }

  test("frameNearDup: every cluster spans >= 2 docs with matching fingerprints; short tails excluded") {
    val out = Multimodal.frameNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // recompute fingerprints for the reported frames from the raw slices
    val fr = Multimodal.frameSample(spark, dir)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("len"),
        graft.functions.DHash64(col("frame")).as("fhash"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3))).toMap
    for ((fhash, nDocs, docId, frameIdx) <- out) {
      val (len, expectHash) = fr((docId, frameIdx))
      assert(len >= 16, s"short tail frame ($docId, $frameIdx) leaked into clusters")
      assert(expectHash == fhash, s"($docId, $frameIdx) fingerprint mismatch")
      val docsWithHash = out.filter(_._1 == fhash).map(_._3).distinct
      assert(docsWithHash.length.toLong == nDocs && nDocs >= 2,
        s"cluster $fhash support: ${docsWithHash.length} vs $nDocs")
    }
    assert(out.nonEmpty, "fixture produced no repeated frames — spec is vacuous")
  }

  test("mediaStats: modality partition of all docs, byte totals consistent") {
    val stats = Multimodal.mediaStats(spark, dir).collect()
    assert(stats.map(_.getAs[String]("mime")).toSeq ==
      Multimodal.Modalities.sorted)
    val docs = Tables(spark, dir, "documents").count()
    assert(stats.map(_.getAs[Long]("n")).sum == docs)
  }

  test("mediaResize: thumbnails equal a JVM box-filter over the leading byte grid") {
    val src = Multimodal.ThumbSrc; val dst = Multimodal.ThumbDst
    val texts = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val eligible = texts.filter(_._3 >= src * src)
    val out = Multimodal.mediaResize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSet == eligible.map(_._1).toSet,
      "exactly the payloads long enough for the source grid")
    assert(out.nonEmpty)
    val byId = eligible.map(t => t._1 -> t._2).toMap
    for ((id, csv, bSum, pMin, pMax) <- out) {
      val t = byId(id)
      val thumb = (0 until dst * dst).map { j =>
        val (r0, c0) = ((j / dst) * 2, (j % dst) * 2)
        def px(r: Int, c: Int) = t.charAt(r * src + c).toInt
        (px(r0, c0) + px(r0, c0 + 1) + px(r0 + 1, c0) + px(r0 + 1, c0 + 1)) / 4
      }
      assert(csv == thumb.mkString(","), s"doc $id thumbnail")
      assert(bSum == thumb.map(_.toLong).sum && pMin == thumb.min && pMax == thumb.max)
    }
  }
}
