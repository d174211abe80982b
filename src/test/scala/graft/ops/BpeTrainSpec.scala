package graft.ops

import graft.SparkSuite

class BpeTrainSpec extends SparkSuite {
  import spark.implicits._

  /** Independent single-node reference: plain maps and loops, no shared
    * code with the Spark implementation — the published algorithm
    * (overlapping pair stats, greedy non-overlapping merge, count-desc /
    * left-asc / right-asc tie-break).
    */
  private def referenceBpe(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ "</w>" }(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; Seq(a, b) <- syms.sliding(2))
        pairs((a, b)) = pairs.getOrElse((a, b), 0L) + n
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairs.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((rank, a, b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
        }(_._2)(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  test("learnMerges equals the independent reference on the sf0.001 corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = BpeTrain.learnMergesOf(spark, docs, nMerges = 12).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val words = BpeTrain.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(words, 12)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("the distributed regime (gate forced off) equals the driver regime merge-for-merge") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val driver = BpeTrain.learnMergesOf(spark, docs, nMerges = 8).collect().toSeq
    val dist = BpeTrain.learnMergesOf(spark, docs, nMerges = 8, driverVocabGate = 0)
      .collect().toSeq
    assert(driver == dist, s"\ndriver $driver\ndist   $dist")
  }

  /** Independent WordPiece reference: same mechanics, likelihood-ratio
    * selection cnt/(c(a)·c(b)). */
  private def referenceWp(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ "</w>" }(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val syms = scala.collection.mutable.Map.empty[String, Long]
      for ((ss, n) <- vocab) {
        for (s <- ss) syms(s) = syms.getOrElse(s, 0L) + n
        for (Seq(a, b) <- ss.sliding(2)) pairs((a, b)) = pairs.getOrElse((a, b), 0L) + n
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairs.minBy { case ((x, y), c) =>
          (-(c.toDouble / (syms(x) * syms(y))), x, y) }
        out += ((rank, a, b, cnt))
        vocab = vocab.groupMapReduce { case (ss, _) =>
          ss.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
        }(_._2)(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  test("wordpiece merges equal the independent reference; regimes agree; objective differs from BPE") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val got = BpeTrain.wordpieceMerges(spark, dir, nMerges = 12).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val words = BpeTrain.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceWp(words, 12)
    assert(got == want, s"\ngot  $got\nwant $want")
    // both regimes walk the identical chain
    val dist = BpeTrain.wordpieceMerges(spark, dir, nMerges = 8, driverVocabGate = 0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(dist == want.take(dist.length), s"\ndist $dist\nwant ${want.take(dist.length)}")
    // the likelihood-ratio objective genuinely selects differently than
    // raw pair counts (wordpiece's first merge on this corpus is the
    // classic q+u; BPE's is the most frequent pair)
    val bpe = BpeTrain.learnMergesOf(spark, docs, nMerges = 12).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got.map(t => (t._2, t._3)) != bpe,
      "wordpiece selected the identical merge chain as BPE — objective is vacuous")
  }

  test("pair stats overlap, merges don't: 'aaa' corpus merges in the documented order") {
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val got = BpeTrain.learnMergesOf(spark, docs, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // 'aaa' = [a a a </w>] ×3: (a,a) counted TWICE per word (overlapping
    // stats) → count 6; the merge is non-overlapping → [aa a </w>], where
    // (a,</w>) ties (aa,a) at 3 and wins on left-asc ('a' < 'aa'); then
    // [aa a</w>] merges to one symbol
    assert(got == Seq(
      (1, "a", "a", 6L),
      (2, "a", "</w>", 3L),
      (3, "aa", "a</w>", 3L)), s"got $got")
  }

  test("segmentation is lossless: subwords reassemble to word + </w>, fertility >= 1") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val seg = BpeTrain.segmentationOf(spark, docs).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg.nonEmpty)
    for ((word, syms) <- seg)
      assert(syms.mkString("") == word + "</w>", s"$word segmented lossy: $syms")
    // every word's subword count is >= 1 and <= chars+1 (no empty symbols)
    for ((word, syms) <- seg)
      assert(syms.nonEmpty && syms.length <= word.length + 1)
    // the per-doc stats reconcile with a direct token count
    val stats = BpeTrain.bpeSegmentStats(spark, "/root/testdata/sf0.001")
      .agg(sum("n_words"), sum("n_bpe_tokens")).head()
    val direct = docs.select(explode(Dedup.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").count()
    assert(stats.getLong(0) == direct, "word totals diverge from the corpus")
    assert(stats.getLong(1) >= stats.getLong(0), "fewer subwords than words")
  }

  /** Byte-level reference: same loop over hex byte symbols, no `</w>`. */
  private def referenceByteBpe(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) =>
        w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toVector }(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; Seq(a, b) <- syms.sliding(2))
        pairs((a, b)) = pairs.getOrElse((a, b), 0L) + n
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairs.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((rank, a, b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
        }(_._2)(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  test("byte-level merges equal the independent reference; both regimes agree") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = BpeTrain.learnByteMergesOf(spark, docs, nMerges = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val words = BpeTrain.bytePretokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceByteBpe(words, 10)
    assert(got == want, s"\ngot  $got\nwant $want")
    val dist = BpeTrain.learnByteMergesOf(spark, docs, nMerges = 10,
      driverVocabGate = 0).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(dist == want, s"distributed regime diverged:\ndist $dist\nwant $want")
  }

  test("byte-level segmentation is LOSSLESS on multi-byte UTF-8, no fallback state") {
    // pretokens with 2-, 3-, and 4-byte UTF-8 sequences, mixed case and
    // punctuation — the inputs char-fallback BPE handles specially and
    // byte-level must handle natively
    val docs = Seq(
      (1L, "Héllo wörld Héllo"),
      (2L, "日本語 テスト 日本語"),
      (3L, "emoji 👍👍 mix—dash… don't"),
      (4L, "Héllo 日本語 👍")).toDF("doc_id", "text")
    val seg = BpeTrain.byteSegmentationOf(spark, docs, nMerges = 15).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    assert(seg.nonEmpty)
    for ((word, syms) <- seg) {
      // every symbol is non-empty even-length hex (a whole byte run)
      for (s <- syms)
        assert(s.nonEmpty && s.length % 2 == 0 && s.matches("[0-9A-F]+"),
          s"non-hex symbol '$s' for pretoken '$word'")
      // lossless reassembly: unhex(concat(syms)) == the original bytes
      val bytes = syms.mkString("").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      assert(new String(bytes, "UTF-8") == word,
        s"lossy byte segmentation for '$word': $syms")
    }
    // no unseen-word state exists: every distinct pretoken got a segmentation
    val nPre = BpeTrain.bytePretokenCounts(docs).count()
    assert(seg.length.toLong == nPre, "some pretoken missing a segmentation")
    // case preserved: 'Héllo' must appear as its own pretoken (no lowercasing)
    assert(seg.exists(_._1 == "Héllo"), "byte-level BPE must not lowercase")
  }

  test("byte-level segment stats reconcile with a direct pretoken count; fertility sane") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val stats = BpeTrain.bpeByteSegmentStats(spark, dir)
      .agg(sum("n_pretokens"), sum("n_bpe_tokens")).head()
    val direct = docs.select(explode(regexp_extract_all(col("text"),
      lit(TextAnalysis.BpePattern), lit(0))).as("w")).count()
    assert(stats.getLong(0) == direct,
      "pretoken totals diverge from the corpus (the vocabulary must be total)")
    // bytes-per-pretoken bounds: 1 <= n_sub, and merges only shrink, so
    // subword total <= byte total and >= pretoken total
    val bytes = docs.select(explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpePattern), lit(0))).as("w"))
      .agg(sum(length(encode(col("w"), "UTF-8")))).head().getLong(0)
    assert(stats.getLong(1) >= stats.getLong(0) && stats.getLong(1) <= bytes,
      s"subword total ${stats.getLong(1)} outside [pretokens $direct, bytes $bytes]")
  }

  test("merge table is deterministic and exhausts gracefully") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // [a b </w>] exhausts after 2 merges; asking for 10 must not loop/fail
    val a = BpeTrain.learnMergesOf(spark, docs, nMerges = 10).collect().toSeq
    val b = BpeTrain.learnMergesOf(spark, docs, nMerges = 10).collect().toSeq
    assert(a == b)
    assert(a.length == 2, s"expected exhaustion at 2 merges, got ${a.length}")
  }
}
