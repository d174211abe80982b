package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CorpusRefreshSpec extends SparkSuite {
  import spark.implicits._

  // Planted corpus. History ids 40..47 (all % 10 < 8), batch ids
  // 48/49/58/59/68/69 (% 10 ∈ {8, 9}) — history precedes the batch in
  // keeper order, the documented refresh ≡ rebuild precondition.
  // History is CURATED by construction: URL-distinct (ids ∉ {8,19} mod 40
  // keep their own URL key), mutually non-near-dup, quality-passing.
  private val histText = Seq(
    "the museum curator arranged ancient pottery along marble shelves " +
      "while visitors studied each label with genuine curiosity tonight",
    "the lighthouse keeper climbed seventy iron steps before dawn and " +
      "polished every lens until ships could trust the beam tonight",
    "the orchestra rehearsed a difficult passage until the strings and " +
      "brass finally agreed about tempo near the ninth measure",
    "the botanist catalogued rare ferns growing beside volcanic springs " +
      "and pressed samples carefully between sheets of waxed paper",
    "the carpenter measured oak planks twice before cutting joints for " +
      "a staircase that would spiral gently toward the attic",
    "the astronomer tracked a faint comet across winter skies and " +
      "logged its position against familiar constellations every evening",
    "the baker proofed sourdough loaves overnight then scored patterns " +
      "into the crust so steam could escape during the morning bake",
    "the cartographer traced river bends onto vellum and shaded the " +
      "foothills until the whole valley seemed to rise from the page")
  private val history = (40L to 47L).zip(histText)
    .map { case (id, t) => (id, "srcA", t) }
  private val batch = Seq(
    // 48 % 40 = 8 → URL key 47, claimed by history 47 → url_dup
    (48L, "srcB", "the fresh unique meadow text about planting orchards " +
      "with the family every spring morning while birds sing loudly"),
    // near-copy of history 41 (one word changed) → near_dup vs the index
    (49L, "srcB", histText(1).replace("tonight", "today")),
    // quality-fail: too_short (< 15 tokens)
    (58L, "srcB", "tiny doc indeed"),
    // 59 % 40 = 19 → URL key 58 = batch 58's own key → url_dup (keep-first)
    (59L, "srcB", "the second unique commentary about mountain trails and " +
      "the way hikers pace themselves across long afternoon climbs"),
    // clean → landed
    (68L, "srcB", "the third unique essay concerning rivers that bend " +
      "through the valley and the bridges people build across them"),
    // near-copy of batch 68 (smaller id) → near_dup within the batch
    (69L, "srcB", "the third unique essay concerning rivers that bend " +
      "through the valley and the bridges people build across it"))

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  private def fates(out: Array[org.apache.spark.sql.Row]) =
    out.map(r => r.getLong(0) -> (r.getString(1),
      if (r.isNullAt(2)) -1 else r.getInt(2))).toMap

  test("planted funnel: every stage drops exactly its planted doc; landed rows shard+pack") {
    val out = CorpusRefresh.refreshOf(df(history), df(batch)).collect()
    assert(out.length == batch.length, "one fate row per batch doc")
    val f = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f(48L) == "url_dup", s"48: ${f(48L)}")
    assert(f(49L) == "near_dup", s"49: ${f(49L)}")
    assert(f(58L) == "quality_too_short", s"58: ${f(58L)}")
    assert(f(59L) == "url_dup", s"59: ${f(59L)}")
    assert(f(68L) == "landed", s"68: ${f(68L)}")
    assert(f(69L) == "near_dup", s"69: ${f(69L)}")
    for (r <- out) {
      if (r.getString(1) == "landed") {
        assert(!r.isNullAt(2) && r.getInt(2) >= 0 && r.getInt(2) <= 15,
          s"landed row without a valid shard: $r")
        assert(!r.isNullAt(3) && r.getInt(3) >= 1,
          s"landed row without a pack bin: $r")
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3),
          s"dropped row carries shard/bin: $r")
      }
    }
  }

  test("refresh == full rebuild when history is curated and precedes the batch") {
    // The composite's central claim: refreshing the batch against curated
    // history assigns EXACTLY the fates a full rebuild over history∪batch
    // assigns to the batch docs. (Pack bins are excluded — packing is a
    // per-refresh artifact over that run's landed set, batch-local by
    // design; fates and landing shards are the contract.)
    val refresh = CorpusRefresh.refreshOf(df(history), df(batch)).collect()
    val empty = df(Seq.empty)
    val rebuild = CorpusRefresh.refreshOf(empty, df(history ++ batch)).collect()
      .filter(r => batch.exists(_._1 == r.getLong(0)))
    assert(fates(refresh) == fates(rebuild),
      s"refresh ${fates(refresh)} != rebuild ${fates(rebuild)}")
    // and the rebuild confirms history really is curated: every history
    // doc lands (none dropped by any stage)
    val histFates = CorpusRefresh.refreshOf(empty, df(history ++ batch)).collect()
      .filter(r => history.exists(_._1 == r.getLong(0)))
    assert(histFates.forall(_.getString(1) == "landed"),
      s"history not curated: ${histFates.filter(_.getString(1) != "landed").mkString(", ")}")
  }

  test("index-only discipline: the core consumes stored artifacts, never history text") {
    // Write the three history index artifacts to parquet (what the last
    // full run would have landed), then refresh the batch READING ONLY
    // those artifacts — the result must equal the derive-from-raw path.
    val tmp = java.nio.file.Files.createTempDirectory("refresh_idx").toString
    val h = df(history)
    // derive the artifacts exactly as refreshOf does, but WRITE them
    val histCanon = h.select(Sampling.canonicalUrl(
      CorpusRefresh.plantedRefreshUrlForTest).as("canon")).distinct()
    val histBands = CorpusRefresh.bandsForTest(h)
      .select(col("band"), col("band_hash"), col("doc_id").as("hist_id"),
        lit(graft.functions.MinHashBands.SchemeVersion).as("mh_scheme"))
    val histSh = h.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    histCanon.write.mode("overwrite").parquet(s"$tmp/canon")
    histBands.write.mode("overwrite").parquet(s"$tmp/bands")
    histSh.write.mode("overwrite").parquet(s"$tmp/shingles")
    val viaIndex = CorpusRefresh.refreshAgainstIndex(
      spark.read.parquet(s"$tmp/canon"),
      spark.read.parquet(s"$tmp/bands"),
      spark.read.parquet(s"$tmp/shingles"),
      df(batch)).collect()
    val viaRaw = CorpusRefresh.refreshOf(h, df(batch)).collect()
    assert(viaIndex.map(_.toString).toSeq == viaRaw.map(_.toString).toSeq,
      "artifact-table path diverged from the derive-from-raw path")
  }

  test("stored-artifact entry point fails fast on an unstamped band store") {
    // A pre-versioning artifact (no mh_scheme column) must be rejected at
    // refreshAgainstIndex itself, not only in the streaming wrappers — a
    // stale-scheme store would otherwise silently report zero near-dups.
    val h = df(history)
    val (canon, bands, sh) = CorpusRefresh.indexArtifactsOf(h)
    val ex = intercept[IllegalArgumentException] {
      CorpusRefresh.refreshAgainstIndex(
        canon, bands.drop("mh_scheme"), sh, df(batch)).collect()
    }
    assert(ex.getMessage.contains("mh_scheme"))
  }
}
