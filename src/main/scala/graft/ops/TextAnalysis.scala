package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines over the `documents` table:
  * token statistics, quality scoring, stopword-based language ID, and
  * content fingerprinting. Pure column expressions — one narrow projection
  * per query, no shuffle except the final (tiny) sort for deterministic
  * output.
  *
  * Ratios divide integer-derived doubles, so results are bit-identical
  * across engines; score combinators are fixed-order IEEE ops.
  */
object TextAnalysis {

  import Dedup.tokens

  /** Per-language stopword lists for the heuristic language scorer. The
    * testdata corpus is synthetic English-ish word bags, so 'en' dominates —
    * the point is the *shape*: N parallel set-intersection scores + argmax,
    * which is how a real n-gram/stopword lang-ID runs at scale.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Token statistics: count, distinct count, mean token length, TTR. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    val meanLen = aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / nTok
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_types"),
      round(meanLen, 4).as("mean_token_len"),
      round(size(array_distinct(t)).cast("double") / nTok, 4).as("ttr"))
      .orderBy("doc_id")
  }

  val tokenStatsSql: String =
    """SELECT doc_id,
      |  len(t) AS n_tokens,
      |  len(list_distinct(t)) AS n_types,
      |  round(list_sum(list_transform(t, x -> length(x)))::double / len(t), 4) AS mean_token_len,
      |  round(len(list_distinct(t))::double / len(t), 4) AS ttr
      |FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Heuristic quality score à la corpus-filtering pipelines: token count
    * band, type/token ratio, mean token length band, stopword presence.
    * Deterministic arithmetic; thresholds tuned to spread on the testdata.
    */
  // The heuristic's rule thresholds — ONE definition feeding
  // [[qualityScore]] AND the LR distillation teacher
  // ([[QualityModel.teacherCol]]), so retuning the heuristic can never
  // silently diverge from the model that claims to distill it.
  val QualityMinTokens = 30
  val QualityMinTtr = 0.4
  val QualityLenLo = 3.5
  val QualityLenHi = 6.5
  val QualityMinStops = 2

  /** The shared raw quality features over a `text` column — the single
    * definition behind the heuristic score, the LR teacher label, and the
    * LR student features ([[QualityModel]]). `nTokens`/`stopHits` are the
    * integer counts; `ttr`/`meanLen` the exact IEEE ratios. */
  private[ops] case class QualityFeatures(
      nTokens: Column, ttr: Column, meanLen: Column, stopHits: Column) {
    /** Heuristic rule hit count 0..4. */
    def ruleHits: Column =
      when(nTokens >= QualityMinTokens, lit(1)).otherwise(lit(0)) +
      when(ttr >= QualityMinTtr, lit(1)).otherwise(lit(0)) +
      when(meanLen >= lit(QualityLenLo) && meanLen <= lit(QualityLenHi), lit(1)).otherwise(lit(0)) +
      when(stopHits >= QualityMinStops, lit(1)).otherwise(lit(0))
  }

  private[ops] def qualityFeatures: QualityFeatures = {
    val t = tokens(col("text"))
    val nTokens = size(t)
    QualityFeatures(
      nTokens,
      size(array_distinct(t)).cast("double") / nTokens.cast("double"),
      aggregate(t, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / nTokens.cast("double"),
      size(array_intersect(t, array(Stopwords.head._2.map(lit): _*))))
  }

  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val f = qualityFeatures
    // 0.25 per rule hit: k·0.25 is exact in binary for k = 0..4, so this
    // equals the historical sum-of-0.25-whens bit for bit
    val score = f.ruleHits.cast("double") * 0.25
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      f.nTokens.as("n_tokens"),
      round(f.ttr, 4).as("ttr"),
      round(f.meanLen, 4).as("mean_len"),
      f.stopHits.as("stop_hits"),
      round(score, 2).as("quality"))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String =
    """SELECT doc_id, n_tokens, ttr, mean_len, stop_hits,
      |  round((CASE WHEN n_tokens >= 30 THEN 0.25 ELSE 0 END
      |       + CASE WHEN ttr >= 0.4 THEN 0.25 ELSE 0 END
      |       + CASE WHEN mean_len >= 3.5 AND mean_len <= 6.5 THEN 0.25 ELSE 0 END
      |       + CASE WHEN stop_hits >= 2 THEN 0.25 ELSE 0 END), 2) AS quality
      |FROM (
      |  SELECT doc_id, len(t) AS n_tokens,
      |    round(len(list_distinct(t))::double / len(t), 4) AS ttr,
      |    round(list_sum(list_transform(t, x -> length(x)))::double / len(t), 4) AS mean_len,
      |    len(list_intersect(t, ['the', 'a', 'of', 'and', 'to'])) AS stop_hits
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Stopword-vote language ID: score per language = stopword hits; predict
    * the argmax (ties resolved by list order), 'und' when all zero.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val hits = Stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(t, array(words.map(lit): _*)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val predicted = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && best > 0, lang).otherwise(acc)
    }
    // foldRight puts earlier list entries in OUTER when-clauses → first
    // max wins, matching the documented tie order.
    Tables(spark, dir, "documents").select(
      col("doc_id"), col("lang").as("labeled"),
      predicted.as("predicted"),
      (predicted === col("lang")).as("is_match"))
      .orderBy("doc_id")
  }

  val langIdSql: String =
    """SELECT doc_id, lang AS labeled,
      |  CASE WHEN best = 0 THEN 'und'
      |       WHEN h_en = best THEN 'en'
      |       WHEN h_es = best THEN 'es'
      |       WHEN h_de = best THEN 'de'
      |       WHEN h_fr = best THEN 'fr'
      |       WHEN h_zh = best THEN 'zh' END AS predicted,
      |  (CASE WHEN best = 0 THEN 'und'
      |       WHEN h_en = best THEN 'en'
      |       WHEN h_es = best THEN 'es'
      |       WHEN h_de = best THEN 'de'
      |       WHEN h_fr = best THEN 'fr'
      |       WHEN h_zh = best THEN 'zh' END = lang) AS is_match
      |FROM (
      |  SELECT doc_id, lang,
      |    greatest(h_en, h_es, h_de, h_fr, h_zh) AS best,
      |    h_en, h_es, h_de, h_fr, h_zh
      |  FROM (
      |    SELECT doc_id, lang,
      |      len(list_intersect(t, ['the','a','of','and','to'])) AS h_en,
      |      len(list_intersect(t, ['el','la','de','y','que'])) AS h_es,
      |      len(list_intersect(t, ['der','die','das','und','zu'])) AS h_de,
      |      len(list_intersect(t, ['le','la','de','et','que'])) AS h_fr,
      |      len(list_intersect(t, ['的','是','了','在','我'])) AS h_zh
      |    FROM (SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS t FROM documents)))
      |ORDER BY doc_id""".stripMargin

  /** GPT-style pre-tokenizer pattern, restricted to the subset both Java
    * regex (Spark) and RE2 (DuckDB) support — i.e. the classic contraction/
    * letter-run/digit-run/punctuation-run classes WITHOUT the trailing
    * lookahead variants (RE2 has no lookahead). Space-prefixed runs mirror
    * byte-level BPE's leading-space convention.
    */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token statistics: subword-style token count vs whitespace
    * token count per document — the "how many tokens will the model see"
    * estimate a training pipeline budgets by.
    */
  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame = {
    val bpe = regexp_extract_all(col("text"), lit(BpePattern), lit(0))
    val wsTok = tokens(col("text"))
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      size(bpe).as("n_bpe"),
      size(array_distinct(bpe)).as("n_bpe_distinct"),
      size(wsTok).as("n_ws"),
      round(size(bpe).cast("double") / size(wsTok), 4).as("bpe_per_word"))
      .orderBy("doc_id")
  }

  val bpeTokenStatsSql: String =
    """SELECT doc_id,
      |  len(b) AS n_bpe,
      |  len(list_distinct(b)) AS n_bpe_distinct,
      |  len(regexp_split_to_array(lower(text), '\s+')) AS n_ws,
      |  round(len(b)::double / len(regexp_split_to_array(lower(text), '\s+')), 4) AS bpe_per_word
      |FROM (
      |  SELECT doc_id, text,
      |    regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+') AS b
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Content fingerprint: md5 of the whitespace-normalized, lower-cased
    * text — the exact-dedup key as a first-class derived column.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      md5(lower(graft.pipeline.TextClean.collapseWs(col("text")))).as("fp"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprint summary per document (rolling-hash k-grams +
    * rightmost-min window selection — [[graft.functions.Winnow]]). The
    * fingerprint SET is the dedup artifact; this query surfaces its
    * deterministic summary scalars, oracle-checked by a DuckDB
    * re-derivation of the whole scheme ([[winnowFingerprintsSql]]).
    */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val fp = graft.functions.Winnow(col("text"))
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      size(fp).as("n_fp"),
      array_min(fp).as("fp_min"),
      array_max(fp).as("fp_max"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary / heavy hitters: top terms by total frequency with
    * document frequency — the scan that seeds a tokenizer vocab or a
    * stopword list.
    *
    * Scale shape: explode is map-side; the aggregation is TWO-LEVEL —
    * first (doc_id, token) counts (pre-aggregated before the shuffle by
    * partial aggregation), then per-token (Σtf, df) — so document
    * frequency is a plain `count` over the first level, never a
    * `count(DISTINCT doc_id)` Expand over the raw token stream. The final
    * top-k is TakeOrderedAndProject, not a global sort.
    */
  def vocabTopTerms(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("n"))
      .groupBy("token")
      .agg(sum(col("n")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  val vocabTopTermsSql: String =
    """SELECT token, sum(n)::BIGINT AS tf, count(*) AS df
      |FROM (
      |  SELECT doc_id, token, count(*) AS n
      |  FROM (
      |    SELECT doc_id,
      |      unnest(regexp_split_to_array(lower(text), '\s+')) AS token
      |    FROM documents)
      |  GROUP BY doc_id, token)
      |GROUP BY token
      |ORDER BY tf DESC, token
      |LIMIT 100""".stripMargin

  /** Vocabulary size for the OOV audit — small enough that the synthetic
    * corpus's tail actually falls outside it (a full-coverage vocab would
    * degenerate the audit to all-zeros). */
  val OovVocabSize = 20

  /** Out-of-vocabulary rate audit — the tokenizer-design readout: freeze
    * the top-[[OovVocabSize]] corpus vocabulary (by tf, ties by token —
    * the [[vocabTopTerms]] order) and measure, per language, how much of
    * the token stream falls outside it. High per-lang OOV is the signal
    * that a shared vocab under-serves that language (the multilingual
    * fertility problem every tokenizer paper measures). Exact integers
    * end-to-end; the rate is integer permille.
    *
    * Scale shape: vocab is a top-k (TakeOrderedAndProject) broadcast; the
    * token stream is scanned once, membership is a broadcast left join;
    * per-doc counts pre-aggregate map-side before the |langs|-bounded
    * rollup.
    */
  def oovRateAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val vocab = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(OovVocabSize)
      .select(col("token"), lit(1).as("iv"))
    val perDoc = docs
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens_total"),
        sum(col("n_oov")).as("oov_total"))
      .withColumn("oov_permille", expr("(oov_total * 1000L) div tokens_total"))
      .orderBy("lang")
  }

  val oovRateAuditSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
       |  FROM documents
       |), vocab AS (
       |  SELECT token FROM (
       |    SELECT token, count(*) AS tf FROM toks GROUP BY 1)
       |  ORDER BY tf DESC, token LIMIT $OovVocabSize
       |), per_doc AS (
       |  SELECT doc_id, lang, count(*) AS n_tok,
       |    sum(CASE WHEN token NOT IN (SELECT token FROM vocab)
       |        THEN 1 ELSE 0 END) AS n_oov
       |  FROM toks GROUP BY 1, 2
       |)
       |SELECT lang, count(*) AS n_docs,
       |  sum(n_tok)::BIGINT AS tokens_total,
       |  sum(n_oov)::BIGINT AS oov_total,
       |  ((sum(n_oov) * 1000) // sum(n_tok))::BIGINT AS oov_permille
       |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  /** Count-min-sketch heavy hitters — the frequency-estimation member of
    * the sketch family (HLL for cardinality, GK for percentiles, Bloom for
    * membership): term frequencies estimated from a fixed-size CMS instead
    * of the exact (token → count) aggregate. At 100 TB the exact vocabulary
    * aggregate shuffles the full token stream; the sketch is mergeable
    * per-partition state of `ceil(e/eps) × ceil(ln(1/(1−conf)))` counters
    * that never grows with the corpus, and its one-sided error
    * (`true ≤ est ≤ true + eps·N` w.p. ≥ conf) is exactly what top-k
    * screening tolerates. [[vocabTopTerms]] is the exact anchor; the error
    * envelope and top-k agreement are spec-pinned (the sketch's hash layout
    * is engine-specific → rows-only oracle, like the HLL/GK/Bloom queries).
    */
  def vocabHeavyHittersCms(spark: SparkSession, dir: String, k: Int = 20,
      eps: Double = 0.0005, conf: Double = 0.99): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
    val cms = toks.stat.countMinSketch("token", eps, conf, 42)
    val cmsB = toks.sparkSession.sparkContext.broadcast(cms)
    // Deliberately an interpreted UDF (evaluated, with Bloom now on the
    // built-in expressions, as the engine's ONE remaining udf call): Spark
    // ships no CMS probe expression — unlike Bloom there is no
    // `might_contain` analogue — so codegen would mean hand-writing a
    // d-row×w-col literal-table expression. Not worth it here: the probe
    // runs ONLY over the bounded Misra-Gries candidate union (≤
    // partitions·cap rows regardless of corpus size, see below), never
    // over the token stream, so at 100 TB this UDF executes a few hundred
    // thousand times while the sketch build — a codegen'd
    // TypedImperativeAggregate — does the corpus-scale work.
    val est = udf((t: String) => cmsB.value.estimateCount(t))
    // Probe-candidate set: a per-partition MISRA-GRIES summary, NOT a
    // vocabulary-wide `distinct()` — at 100 TB that distinct IS the exact
    // aggregation the sketch exists to avoid. Each task keeps the classic
    // `cap`-counter MG state (unseen token with full state decrements ALL
    // counters — never discards accumulated counts wholesale, which is
    // what gives the guarantee a top-m batch prune lacks): every token
    // with local frequency > n_p/(cap+1) survives its partition's summary,
    // so by pigeonhole every token with GLOBAL frequency > N/(cap+1)
    // appears in the union of summaries — with cap=4096 that is any token
    // above ~0.02% of the corpus, orders of magnitude below a top-20
    // heavy hitter. The whole summary (≤ cap entries per partition, ≤
    // partitions·cap total) is emitted; the only exchange left is the
    // candidate dedup over that bounded union.
    val cap = math.max(4096, 8 * 16 * k)
    import toks.sparkSession.implicits._
    val cand = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for (t <- it) {
        counts.get(t) match {
          case Some(c) => counts(t) = c + 1
          case None if counts.size < cap => counts(t) = 1L
          case None => // decrement-all: the MG step that preserves the bound
            val dead = List.newBuilder[String]
            for ((k2, c2) <- counts) {
              if (c2 == 1L) dead += k2 else counts(k2) = c2 - 1
            }
            dead.result().foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("token").dropDuplicates("token")
    cand
      .withColumn("est_tf", est(col("token")))
      .orderBy(col("est_tf").desc, col("token"))
      .limit(k)
  }

  /** Corpus length profiling: equi-width histogram of document length per
    * language — the distribution scan behind truncation/packing decisions.
    * Bucket arithmetic is integer (`div`), shares are exact IEEE divisions
    * of integer counts; one hash aggregate, no window.
    */
  def lengthHistogram(spark: SparkSession, dir: String, bucketChars: Int = 100): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs
      .groupBy(col("lang"), expr(s"length(text) div $bucketChars").as("bucket"))
      .agg(count(lit(1)).as("n"))
      // per-lang share: tiny second agg joined back (broadcast) — NOT a
      // window over the whole table
      .join(broadcast(docs.groupBy("lang").agg(count(lit(1)).as("lang_n"))), Seq("lang"))
      .select(col("lang"), col("bucket"), col("n"),
        round(col("n").cast("double") / col("lang_n"), 4).as("share"))
      .orderBy("lang", "bucket")
  }

  val lengthHistogramSql: String =
    """SELECT h.lang AS lang, bucket, n,
      |  round(n::double / lang_n, 4) AS share
      |FROM (
      |  SELECT lang, length(text) // 100 AS bucket, count(*) AS n
      |  FROM documents GROUP BY 1, 2) h
      |JOIN (
      |  SELECT lang, count(*) AS lang_n FROM documents GROUP BY lang) t
      |  ON h.lang = t.lang
      |ORDER BY h.lang, bucket""".stripMargin

  /** Distinctive terms per document: top-3 tokens ranked by tf/df — term
    * frequency in the document over corpus document frequency, the
    * TF-IDF deployment shape (ranking by tf/df is idf-monotone for fixed
    * tf and avoids `ln`, whose libm rounding is not cross-engine exact;
    * IEEE division IS correctly rounded, so the scores hash identically).
    *
    * Scale shape: (doc, token) counts → per-token df aggregate (the small
    * side, broadcast back) → per-doc top-k window partitioned by doc_id.
    * The window partitions by the HIGH-cardinality key, so no task ever
    * sorts more than one document's terms.
    */
  /** Phrases reported by [[rakeKeyphrases]]. */
  val RakeTopK = 20

  /** RAKE keyphrase extraction (Rose et al. 2010 — public knowledge):
    * candidate phrases are the maximal stopword-delimited token runs;
    * each word scores degree/frequency over its candidate occurrences
    * (degree = Σ length of the phrases it appears in — favoring words
    * that live in long, content-dense phrases); a phrase scores the sum
    * of its words' scores. The corpus-level top-k completes the
    * text-analysis keyword ladder: raw counts (vocab_top_terms) →
    * distinctiveness (tf-idf / PMI) → multiword KEYPHRASES.
    *
    * Exactness: freq/degree are integer aggregates; each word score is
    * one IEEE division, cast DECIMAL(24,12) before the per-phrase sum
    * (order-free), one rounding at the end. Delimiters are the pinned
    * multilingual stopword table.
    *
    * Scale shape: one tokenize scan; the run-id window is per-doc
    * (partitions bounded by document length); word stats are a
    * vocabulary-sized aggregate broadcast onto the distinct-phrase
    * table; top-k via orderBy+limit (TakeOrderedAndProject — no global
    * sort materializes).
    */
  def rakeKeyphrases(spark: SparkSession, dir: String,
      k: Int = RakeTopK): DataFrame = {
    val stops = Stopwords.flatMap(_._2)
    val flat = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .withColumnRenamed("col", "tok")
      .withColumn("stop", col("tok").isInCollection(stops))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val cand = flat
      .withColumn("run", sum(col("stop").cast("int")).over(w))
      .filter(!col("stop"))
      .groupBy("doc_id", "run")
      .agg(array_sort(collect_list(struct(col("pos"), col("tok")))).as("pt"))
      .select(
        array_join(expr("transform(pt, x -> x.tok)"), " ").as("phrase"),
        size(col("pt")).as("len"))
      // persisted: feeds BOTH word stats and phrase occurrences — without
      // it the tokenize scan + run-id window run twice (the bm25 tf
      // discipline)
      .persist()
    val wstats = cand
      .select(explode(split(col("phrase"), " ")).as("w"), col("len"))
      .groupBy("w").agg(count(lit(1)).as("freq"), sum("len").as("deg"))
    val occ = cand.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
    occ.select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(broadcast(wstats), Seq("w"))
      .groupBy("phrase", "n_occurrences")
      .agg(count(lit(1)).as("n_words"),
        round(sum((col("deg").cast("double") / col("freq"))
          .cast("decimal(24,12)")).cast("double"), 6).as("score"))
      .select("phrase", "n_words", "n_occurrences", "score")
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  val rakeKeyphrasesSql: String = {
    val stopList = Stopwords.flatMap(_._2).map(s => s"'$s'").mkString(", ")
    s"""WITH flat AS (
       |  SELECT doc_id, pos, t[pos] AS tok, t[pos] IN ($stopList) AS stop
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t,
       |          unnest(range(1, len(regexp_split_to_array(lower(text), '\\s+')) + 1)) AS pos
       |        FROM documents)
       |), runs AS (
       |  SELECT doc_id, pos, tok, stop,
       |    sum(CASE WHEN stop THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS run
       |  FROM flat
       |), cand AS (
       |  SELECT doc_id, run,
       |    string_agg(tok, ' ' ORDER BY pos) AS phrase, count(*) AS len
       |  FROM runs WHERE NOT stop GROUP BY doc_id, run
       |), wstats AS (
       |  SELECT w, count(*) AS freq, sum(len) AS deg FROM (
       |    SELECT unnest(string_split(phrase, ' ')) AS w, len FROM cand)
       |  GROUP BY 1
       |), occ AS (
       |  SELECT phrase, count(*) AS n_occurrences FROM cand GROUP BY 1
       |)
       |SELECT phrase, count(*) AS n_words, any_value(n_occurrences) AS n_occurrences,
       |  round(CAST(sum((deg::DOUBLE / freq)::DECIMAL(24,12)) AS DOUBLE), 6) AS score
       |FROM (SELECT phrase, n_occurrences,
       |        unnest(string_split(phrase, ' ')) AS w FROM occ) x
       |JOIN wstats USING (w)
       |GROUP BY phrase
       |ORDER BY score DESC, phrase LIMIT $RakeTopK""".stripMargin
  }

  def distinctiveTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docTerm = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = docTerm.groupBy("token").agg(count(lit(1)).as("df"))
    // rank on the RAW ratio (IEEE division is correctly rounded → identical
    // cross-engine); only the OUTPUT is rounded. Ranking on the rounded
    // score would let two engines break post-rounding ties differently.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("raw_score").desc, col("token"))
    docTerm.join(broadcast(df), Seq("token"))
      .withColumn("raw_score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
        round(col("raw_score"), 6).as("score"))
      .orderBy("doc_id", "rank")
  }

  val distinctiveTermsSql: String =
    """SELECT doc_id, rank, token, tf, df, score FROM (
      |  SELECT doc_id, token, tf, df,
      |    round(tf::double / df, 6) AS score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf::double / df DESC, token) AS INT) AS rank
      |  FROM (
      |    SELECT doc_id, token, count(*) AS tf
      |    FROM (
      |      SELECT doc_id,
      |        unnest(regexp_split_to_array(lower(text), '\s+')) AS token
      |      FROM documents)
      |    GROUP BY doc_id, token) dt
      |  JOIN (
      |    SELECT token, count(*) AS df
      |    FROM (
      |      SELECT DISTINCT doc_id,
      |        unnest(regexp_split_to_array(lower(text), '\s+')) AS token
      |      FROM documents)
      |    GROUP BY token) d USING (token))
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** The winnow scheme rebuilt in SQL, position by position:
    *
    *  - k-gram hash = Σ code(p+j)·257^(7−j) in HUGEINT, one mod 2⁶⁴ at the
    *    end — identical to the Scala loop's wrapping-long arithmetic (the
    *    constants are 257^j; the largest term stays under 2⁶⁴ for ASCII,
    *    and the sum under 2⁶⁷, so nothing wraps early). The unsigned
    *    residue then maps to the signed-long value Spark emits.
    *  - window selection: `min(struct(h, -p))` over a w-row frame picks
    *    each window's RIGHTMOST minimum (ties → larger p → smaller -p),
    *    exactly the `<=` scan in Winnow.compute; the selected set is the
    *    union over valid window starts (p ≤ m−w+1), with the m ≤ w branch
    *    reducing to one fingerprint per document.
    *
    * Valid for BMP text only (DuckDB `ord` = codepoint, Scala `charAt` =
    * UTF-16 unit — equal below U+10000; the corpus is ASCII). Verified
    * branch-by-branch against a reference implementation including the
    * short-document cases the corpus never hits.
    */
  /** BM25 "more-like-this" retrieval: for each sampled query document
    * (doc_id ≡ 0 mod 50 — the ANN query-set convention), the top-k other
    * documents by Okapi BM25 over the query's distinct terms. The lexical
    * retrieval primitive beside the embedding ANN family — a RAG corpus
    * pipeline runs exactly this shape for hybrid (sparse+dense) recall.
    *
    * Scale shape: tf is one (doc, term) aggregate over the token explode;
    * df and (N, avgdl) are two-level tiny aggregates off tf; query terms
    * broadcast like ANN query batches; the candidate join is an equi-join
    * on the term, whose right side is only the query vocabulary — never a
    * corpus×corpus product. Per-query top-k runs as a rank-limited window
    * (WindowGroupLimit pushes the partial top-k map-side).
    *
    * Ranking uses the ROUNDED score (4 dp) with doc_id tiebreak —
    * deliberately the inverse of [[distinctiveTerms]]' raw-score rule:
    * there the raw score is a single correctly-rounded division (bit-equal
    * cross-engine), here it is an UNORDERED float sum over matched terms,
    * so the raw bits differ by reassociation noise (~1e-15) between any
    * two engines — only the rounded value is cross-engine stable.
    */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFrom(Tables(spark, dir, "documents"), k, k1, b)

  /** BM25 retrieval for a USER-SUPPLIED query batch — the serving-side
    * API ([[bm25TopKFrom]]'s `doc_id % 50` query set is the benchmark
    * formulation, not a contract): `queries` is any `(q_id, text)` frame,
    * tokenized with the corpus tokenizer; candidates form only through
    * the query terms (broadcast), so query cost scales with the batch,
    * never the corpus. A `q_id` that collides with a corpus `doc_id` is
    * treated as that document asking for neighbors and excluded from its
    * own result — the more-like-this convention; disjoint id spaces get
    * pure ad-hoc retrieval. Parity with the benchmark form on its own
    * query sample is spec-pinned.
    */
  def bm25TopKFor(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist() // feeds dl, df, and the candidate join
    // Per-call API: the result is bounded (|queries| × k rows), so
    // materialize it eagerly and release the tf cache NOW — otherwise
    // repeated ad-hoc calls accumulate persisted tf frames for the
    // session lifetime. Callers that score many batches against one
    // corpus should hold a [[bm25BuildIndex]] + [[bm25Score]] instead.
    val out = bm25Against(tf, queries, k, k1, b).localCheckpoint(true)
    tf.unpersist()
    out
  }

  /** BM25 scoring against a PREBUILT term-frequency index — the serving
    * core under [[bm25TopKFor]] (which builds `tf` per call) and the
    * streaming [[graft.streaming.TextStreams]] (which persists `tf` once
    * and re-scores every micro-batch against it). `tf` is the
    * `(doc_id, tok, tf)` aggregate; dl/df/(N, avgdl) re-derive from it —
    * from a cached index those are bounded re-scans, and at serving time
    * the only per-batch work is the query tokenize + the broadcast
    * candidate join.
    */
  private[graft] def bm25Against(tf: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Score(bm25IndexOf(tf, b), queries, k, k1, b)

  /** The query-independent BM25 model legs, buildable (and persistable)
    * ONCE, in the norms-in-postings layout of [[LexModel]]:
    *
    *  - `tfb` (doc_id, tok, tf, bdl): postings with the per-doc length
    *    term `b·dl/avgdl` attached to the row (`b` fixed at build), so a
    *    scoring pass needs NO per-doc join — previously every pass
    *    shuffled the corpus-sized dlb table against the candidates.
    *  - `dfi` (tok, df, idf): per-term df with idf precomputed, so the
    *    query-term leg is one bounded join — no per-pass (N, avgdl)
    *    scalar-combine rebuild.
    *
    * A serving loop that re-derived these per micro-batch would pay
    * corpus-scale shuffles per batch for statistics that never change —
    * [[graft.streaming.TextStreams]] persists both legs and leaves only
    * the query tokenize + broadcast candidate join as per-batch work.
    */
  private[graft] case class Bm25Index(tfb: DataFrame, dfi: DataFrame)

  /** Derive the two serving legs from a postings frame — the shared
    * constructor of the one-shot paths ([[bm25Against]], per call) and
    * the persisted builders. Same expressions as always (`b·dl/avgdl`,
    * `ln((N−df+0.5)/(df+0.5)+1)`), just attached at build instead of
    * re-joined per pass — identical doubles, identical releases. */
  private[graft] def bm25IndexOf(tf: DataFrame, b: Double = 0.75): Bm25Index = {
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tfb = tf.join(
      dl.crossJoin(broadcast(stats))
        .select(col("doc_id"), (lit(b) * col("dl") / col("avgdl")).as("bdl")),
      Seq("doc_id"))
    val dfi = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("tok"), col("df"),
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1).as("idf"))
    Bm25Index(tfb, dfi)
  }

  private[graft] def bm25BuildIndex(docs: DataFrame, b: Double = 0.75): Bm25Index = {
    val ix = bm25IndexOf(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")), b)
    Bm25Index(ix.tfb.persist(), ix.dfi.persist())
  }

  /** The lexical model tables a serving node holds NEXT TO the postings
    * snapshot — reduced (r17 optimization round) to the NORMS-IN-POSTINGS
    * layout search engines actually serve from:
    *
    *  - `tfb`  (doc_id, tok, tf, dl, bdl): the postings with the per-doc
    *    length statistics ATTACHED TO THE ROW (Lucene's norms-next-to-
    *    postings), so a scoring pass reads only the probed postings and
    *    needs NO per-doc join at serve time — previously every pass
    *    shuffled a corpus-sized dl/dlb table against the candidates
    *    (guide §2.4: remove shuffles outright). `bdl = 0.75·dl/avgdl`
    *    (the registered queries' b, folded at build like the old dl
    *    table's derivation — same expression, same doubles).
    *  - `dfi`  (tok, df, cf, idf): per-term stats with the BM25 idf
    *    PRECOMPUTED (`idf` is parameter-free), so a serve's query-term
    *    leg is one bounded join — no per-pass (N, avgdl) scalar-combine
    *    broadcast rebuild.
    *  - `stats` (n_docs, avgdl, c_total): the scalars, one stored row.
    *
    * Every column is a mergeable aggregate of the postings (the exactness
    * argument in [[graft.ops.TextIndex]]'s doc) or a fixed double
    * expression of such aggregates, each a WRITTEN parquet table — not a
    * cached plan — so a serve re-reads index-sized artifacts, never
    * re-aggregates the corpus. At 100 TB these are the incrementally-
    * maintained aggregate tables an `append`/`remove` updates alongside
    * the postings. `paths` holds the snapshot directories for
    * superseded-entry cleanup. */
  private[graft] final case class LexModel(tfb: DataFrame, dfi: DataFrame,
      stats: DataFrame, paths: Seq[String])

  /** The registered queries' BM25 length-normalization parameter — folded
    * into the stored `bdl` column at model build. */
  private[graft] val DefaultB = 0.75

  private val lexModelCache =
    scala.collection.concurrent.TrieMap.empty[String, LexModel]
  private val lexModelLock = new Object

  /** The session-held lexical model for a corpus directory: the postings
    * snapshot from [[TextIndex.servingIndex]] widened to the serving
    * layout above, derived ONCE per (session, dir) and written to disk —
    * so every indexed retrieval serve ([[bm25PrfTopKIndexed]],
    * [[qldTopKIndexed]], the hybrid's lexical leg) pays ZERO corpus-scale
    * model work per query. Integer columns round-trip exactly; the double
    * columns (bdl, idf) are single fixed expressions of integers computed
    * once here instead of per pass — identical bits either way, so
    * indexed/one-shot parity is unconditional. Session lifecycle as
    * [[Similarity.servedLshIndex]]: an entry bound to another session is
    * rebuilt, never returned; a superseded entry's snapshot dirs are
    * deleted only once its session has stopped; build-or-get serialized. */
  private[graft] def servedLexModel(spark: SparkSession, dir: String): LexModel =
    lexModelLock.synchronized {
      lexModelCache.get(dir).filter(_.tfb.sparkSession eq spark).getOrElse {
        lexModelCache.get(dir)
          .filter(_.tfb.sparkSession.sparkContext.isStopped)
          .foreach(_.paths.foreach(IncrementalIndex.deleteDir))
        val tf = TextIndex.servingIndex(spark, dir).tf
        val paths = scala.collection.mutable.ArrayBuffer.empty[String]
        def snap(frame: DataFrame, tag: String): DataFrame = {
          val p = IncrementalIndex.snapshotDir(s"graft_text_model_$tag")
          try frame.write.mode("overwrite").parquet(p)
          catch { case e: Throwable => IncrementalIndex.deleteDir(p); throw e }
          paths += p
          spark.read.parquet(p)
        }
        // the postings leg is the scoring fan-out side — written with the
        // scan-parallelism floor so a serve's candidate join never funnels
        // through a one-row-group file (IncrementalIndex.writeServing doc)
        def snapServing(frame: DataFrame, tag: String): DataFrame = {
          val (f, p) = IncrementalIndex.writeServing(
            frame, s"graft_text_model_$tag")
          paths += p
          f
        }
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val stats = snap(
          dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
            .crossJoin(tf.agg(sum("tf").as("c_total"))), "stats")
        val tfb = snapServing(
          tf.join(dl, Seq("doc_id")).crossJoin(broadcast(stats))
            .select(col("doc_id"), col("tok"), col("tf"), col("dl"),
              (lit(DefaultB) * col("dl") / col("avgdl")).as("bdl")), "tfb")
        val dfi = snap(
          tf.groupBy("tok")
            .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
            .crossJoin(broadcast(stats))
            .select(col("tok"), col("df"), col("cf"),
              log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
                .as("idf")), "dfi")
        val built = LexModel(tfb, dfi, stats, paths.toSeq)
        lexModelCache.put(dir, built)
        built
      }
    }

  /** The BM25 view of [[servedLexModel]]: at the registered queries'
    * `b = 0.75` the stored `bdl` column serves directly; any other `b`
    * re-folds from the stored `dl` with one projection (same expression,
    * never a corpus pass). */
  private[graft] def servedBm25Model(spark: SparkSession, dir: String,
      b: Double = DefaultB): Bm25Index = {
    val m = servedLexModel(spark, dir)
    val tfb =
      if (b == DefaultB) m.tfb
      else m.tfb.drop("bdl").crossJoin(broadcast(m.stats.select("avgdl")))
        .withColumn("bdl", lit(b) * col("dl") / col("avgdl")).drop("avgdl")
    Bm25Index(tfb, m.dfi)
  }

  /** The scoring core shared by the one-shot path ([[bm25Against]], which
    * derives the legs inline) and the serving path (prebuilt
    * [[Bm25Index]]): per-batch work is the query tokenize, the
    * query-vocabulary df/idf join, and the broadcast candidate join.
    */
  private[graft] def bm25Score(ix: Bm25Index, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qidf = queries
      .select(col("q_id"), explode(tokens(col("text"))).as("tok")).distinct()
      .join(ix.dfi, Seq("tok")) // inner: absent-from-corpus terms score nothing
      .select(col("q_id"), col("tok"), col("idf"))
    val scored = ix.tfb.join(broadcast(qidf), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("s",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + col("bdl"))))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("s")), 4).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("score"))
      .orderBy("q_id", "rank")
  }

  /** [[bm25TopK]] over any `(doc_id, text)` frame.
    *
    * Join order puts every per-TERM model statistic on the SMALL side
    * before the one big join: `df` and the (N, avgdl) scalar fold into
    * the query-term leg — qterms ⋈ df is query-vocabulary-sized — so the
    * per-(q, tok) idf broadcasts fully precomputed, and the candidate
    * table (the biggest intermediate) joins ONCE by broadcast on `tok`
    * and once by shuffle on `doc_id` for `dl`. The earlier formulation
    * shuffled the candidate table against the full-vocabulary `df`
    * aggregate; measured at sf0.1 that join was a third of the query.
    * Arithmetic keeps the exact association of the oracle
    * (`b·dl/avgdl` folded per-doc, idf per-term — each still the same
    * op sequence), so the rounded-score ranking is unchanged.
    */
  def bm25TopKFrom(docs: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist() // feeds dl, df, query terms, and the candidate join
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-(query, term) idf — query-vocabulary-sized, broadcast below
    val qidf = tf.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("q_id"), col("tok"))
      .join(df, Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("tok"),
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1).as("idf"))
    // per-doc length term b·dl/avgdl — same op order as the fused form
    val dlb = dl.crossJoin(broadcast(stats))
      .select(col("doc_id"), (lit(b) * col("dl") / col("avgdl")).as("bdl"))
    val scored = tf.join(broadcast(qidf), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(dlb, Seq("doc_id"))
      .withColumn("s",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + col("bdl"))))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("s")), 4).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("score"))
      .orderBy("q_id", "rank")
  }

  /** The size of the pinned serving batch: queries are the documents with
    * `doc_id ≤ ServeBatchMaxId` — a FIXED batch (≤100 queries at every
    * scale factor; ScaleData replicas shift ids by 10⁸, so the original
    * copy alone matches). Contrast with the benchmark formulation's
    * `doc_id % 50` query set, which grows WITH the corpus and makes the
    * benched cost scale ×100 at ×10 data (documented in BASELINE.md):
    * this is the production serving shape, where cost ∝ batch. */
  val ServeBatchMaxId = 100L

  /** BM25 retrieval for the PINNED fixed-size query batch — the
    * registered, benched form of [[bm25TopKFor]] (the serving API), so
    * the headline bench carries the cost-∝-batch contract and not only
    * the corpus-derived benchmark formulation. */
  def bm25TopKServed(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val queries = docs.filter(col("doc_id") <= ServeBatchMaxId)
      .select(col("doc_id").as("q_id"), col("text"))
    bm25TopKFor(docs, queries, k)
  }

  /** Shared oracle template: `qPred` selects the query set from the
    * corpus (`doc_id % 50 = 0` for the benchmark formulation,
    * `doc_id <= ServeBatchMaxId` for the pinned serving batch). */
  private def bm25SqlFor(qPred: String): String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
      |), stats AS (
      |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
      |), df AS (
      |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
      |), qterms AS (
      |  SELECT doc_id AS q_id, tok FROM tf WHERE $qPred
      |), scored AS (
      |  SELECT q.q_id, t.doc_id,
      |    round(sum(
      |      ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
      |        * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
      |    ), 4) AS score
      |  FROM tf t
      |  JOIN qterms q USING (tok)
      |  JOIN df USING (tok)
      |  JOIN dl ON dl.doc_id = t.doc_id
      |  CROSS JOIN stats s
      |  WHERE t.doc_id <> q.q_id
      |  GROUP BY 1, 2
      |)
      |SELECT q_id, doc_id, rank, score FROM (
      |  SELECT q_id, doc_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank,
      |    score
      |  FROM scored)
      |WHERE rank <= 10
      |ORDER BY q_id, rank""".stripMargin

  val bm25TopKServedSql: String = bm25SqlFor(s"doc_id <= $ServeBatchMaxId")

  val bm25TopKSql: String = bm25SqlFor("doc_id % 50 = 0")

  /** Feedback depth / expansion width / expansion weight for
    * [[bm25PrfTopK]]. β = 0.5 is the standard RM3 interpolation midpoint. */
  val FbDocs = 5
  val FbTerms = 5
  val FbBeta = 0.5

  /** Pseudo-relevance-feedback query expansion (the RM3/Rocchio two-pass
    * shape — the production retrieval step after plain BM25): pass 1
    * retrieves each query's top [[FbDocs]] docs; the expansion picks the
    * [[FbTerms]] terms most shared across that feedback set (ranked by
    * feedback-document frequency, rarest-in-collection first on ties —
    * Rocchio with binary weights, chosen over RM1's P(t|R) float weights
    * deliberately: term SELECTION stays pure integer arithmetic, so the
    * expanded query set is bit-derivable cross-engine); pass 2 rescores
    * with original terms at weight 1 and expansion terms at β = 0.5,
    * rounded-sum ranking (the bm25 armor).
    *
    * Scale shape: both passes are the [[bm25TopKFrom]] plan — candidates
    * form only through (broadcast) query-vocabulary term joins; the
    * feedback join is |batch|·fbDocs × doc-vocabulary, batch-bounded. The
    * query set is the pinned serving batch, so cost ∝ batch at any SF.
    * With fbTerms = 0 the whole query provably reduces to
    * [[bm25TopKServed]] (×1.0 is an IEEE identity) — spec-pinned.
    */
  def bm25PrfTopK(spark: SparkSession, dir: String, k: Int = 10,
      fbDocs: Int = FbDocs, fbTerms: Int = FbTerms, beta: Double = FbBeta,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist()
    // both serving legs persisted across the two passes — previously each
    // pass re-derived df/dl/stats from tf and re-joined the corpus-sized
    // dlb table (guide §2.4: two operations keyed the same way share one
    // build; the model is loop-invariant across passes)
    val ix0 = bm25IndexOf(tf, b)
    val ix = Bm25Index(ix0.tfb.persist(), ix0.dfi.persist())
    val out = bm25PrfServe(ix, k, fbDocs, fbTerms, beta, k1, b)
      .localCheckpoint(true) // bounded (|batch|×k); release the model caches
    tf.unpersist(); ix.tfb.unpersist(); ix.dfi.unpersist()
    out
  }

  /** The PRF serving core over prebuilt BM25 model legs — shared verbatim
    * by the one-shot [[bm25PrfTopK]] (derives the legs from a corpus
    * tokenize per call) and the indexed [[bm25PrfTopKIndexed]] (legs held
    * from the written postings snapshot), so one-shot/indexed parity is
    * structural. Per-serve work: two weighted scoring passes (candidates
    * form only through broadcast query-vocabulary term joins against the
    * postings), the batch-bounded feedback join, and the integer expansion
    * ranking — never a corpus text scan.
    */
  private[graft] def bm25PrfServe(ix: Bm25Index, k: Int = 10,
      fbDocs: Int = FbDocs, fbTerms: Int = FbTerms, beta: Double = FbBeta,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qterms = ix.tfb.filter(col("doc_id") <= ServeBatchMaxId)
      .select(col("doc_id").as("q_id"), col("tok"))

    // one weighted scoring pass: (q_id, tok, w) → rounded per-doc sums.
    // idf rides the dfi leg precomputed and bdl rides the postings row, so
    // a pass is ONE broadcast candidate join + the grouped sum — no
    // per-pass corpus-sized dl join, no (N, avgdl) scalar rebuild
    def scorePass(wq: DataFrame) = {
      val qidf = wq.join(ix.dfi, Seq("tok"))
        .select(col("q_id"), col("tok"), col("w"), col("idf"))
      ix.tfb.join(broadcast(qidf), Seq("tok"))
        .filter(col("doc_id") =!= col("q_id"))
        .withColumn("s",
          col("w") * col("idf") * col("tf") * lit(k1 + 1) /
            (col("tf") + lit(k1) * (lit(1 - b) + col("bdl"))))
        .groupBy("q_id", "doc_id")
        .agg(round(sum(col("s")), 4).as("score"))
    }
    val wRank = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))

    // pass 1 → the pseudo-relevant feedback set
    val fb = scorePass(qterms.withColumn("w", lit(1.0)))
      .withColumn("r", row_number().over(wRank)).filter(col("r") <= fbDocs)
      .select("q_id", "doc_id")
    // expansion: terms of the feedback docs, NOT already in the query,
    // ranked by (feedback df DESC, collection df ASC, tok) — all integers.
    // fb is |batch|·fbDocs — broadcast it so the postings are never
    // shuffled for the feedback vocabulary
    val fbt = ix.tfb.select("doc_id", "tok").join(broadcast(fb), Seq("doc_id"))
      .groupBy("q_id", "tok").agg(count(lit(1)).as("fb_df"))
    val wTr = Window.partitionBy("q_id")
      .orderBy(col("fb_df").desc, col("df").asc, col("tok"))
    val expansion = fbt.join(ix.dfi.select("tok", "df"), Seq("tok"))
      .join(qterms.withColumn("orig", lit(true)), Seq("q_id", "tok"), "left")
      .filter(col("orig").isNull)
      .withColumn("tr", row_number().over(wTr)).filter(col("tr") <= fbTerms)
      .select("q_id", "tok")

    // pass 2: original terms at weight 1, expansion at β
    val wq2 = qterms.withColumn("w", lit(1.0))
      .unionByName(expansion.withColumn("w", lit(beta)))
    scorePass(wq2)
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("score"))
      .orderBy("q_id", "rank")
  }

  /** Static EXACT oracle for [[bm25PrfTopK]]: the bm25 model CTEs, the
    * rounded pass-1 window capped at fbDocs, the integer expansion
    * ranking, and the weighted pass-2 restated with the identical
    * left-to-right arithmetic. */
  def bm25PrfTopKSql(k: Int = 10, fbDocs: Int = FbDocs,
      fbTerms: Int = FbTerms, beta: Double = FbBeta): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), tf AS MATERIALIZED (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
       |), dl AS MATERIALIZED (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
       |), stats AS MATERIALIZED (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
       |), df AS MATERIALIZED (
       |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
       |), qterms AS MATERIALIZED (
       |  SELECT doc_id AS q_id, tok FROM tf WHERE doc_id <= $ServeBatchMaxId
       |), scored1 AS (
       |  SELECT q.q_id, t.doc_id,
       |    round(sum(
       |      1.0 * ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
       |        * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
       |    ), 4) AS score
       |  FROM tf t
       |  JOIN qterms q USING (tok)
       |  JOIN df USING (tok)
       |  JOIN dl ON dl.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  WHERE t.doc_id <> q.q_id
       |  GROUP BY 1, 2
       |), fb AS MATERIALIZED (
       |  SELECT q_id, doc_id FROM (
       |    SELECT q_id, doc_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS r
       |    FROM scored1)
       |  WHERE r <= $fbDocs
       |), fbt AS (
       |  SELECT f.q_id, t.tok, count(*) AS fb_df
       |  FROM fb f JOIN tf t ON t.doc_id = f.doc_id
       |  GROUP BY 1, 2
       |), expansion AS MATERIALIZED (
       |  SELECT q_id, tok FROM (
       |    SELECT f.q_id, f.tok,
       |      row_number() OVER (PARTITION BY f.q_id
       |        ORDER BY f.fb_df DESC, df.df ASC, f.tok) AS tr
       |    FROM fbt f
       |    JOIN df USING (tok)
       |    LEFT JOIN qterms qt ON qt.q_id = f.q_id AND qt.tok = f.tok
       |    WHERE qt.tok IS NULL)
       |  WHERE tr <= $fbTerms
       |), wq AS (
       |  SELECT q_id, tok, 1.0 AS w FROM qterms
       |  UNION ALL
       |  SELECT q_id, tok, $beta AS w FROM expansion
       |), scored2 AS (
       |  SELECT q.q_id, t.doc_id,
       |    round(sum(
       |      q.w * ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
       |        * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
       |    ), 4) AS score
       |  FROM tf t
       |  JOIN wq q USING (tok)
       |  JOIN df USING (tok)
       |  JOIN dl ON dl.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  WHERE t.doc_id <> q.q_id
       |  GROUP BY 1, 2
       |)
       |SELECT q_id, doc_id, rank, score FROM (
       |  SELECT q_id, doc_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank,
       |    score
       |  FROM scored2)
       |WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** INDEXED PRF serving — [[bm25PrfTopK]]'s exact twin riding the
    * session-held model over the written postings snapshot
    * ([[servedBm25Model]]): both scoring passes, the feedback join, and
    * the expansion ranking run against stored-index aggregates, never a
    * corpus text scan — the production shape where a PRF query's cost is
    * the serving tail only, with the index build paid once at ingest.
    * Same oracle as the one-shot form (the postings snapshot is an exact
    * aggregate of the corpus, so every released row is identical).
    */
  def bm25PrfTopKIndexed(spark: SparkSession, dir: String, k: Int = 10,
      fbDocs: Int = FbDocs, fbTerms: Int = FbTerms, beta: Double = FbBeta,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25PrfServe(servedBm25Model(spark, dir, b), k, fbDocs, fbTerms, beta, k1, b)

  /** Dirichlet smoothing mass for [[qldTopK]] — the same order as the
    * corpus's ~100-token documents (Zhai & Lafferty's guidance: μ near
    * the average document length). */
  val QldMu = 100.0

  /** Query-likelihood retrieval with Dirichlet smoothing (Ponte & Croft
    * '98 / Zhai & Lafferty '01) — the LANGUAGE-MODEL ranking next to
    * BM25's probabilistic one (production stacks A/B the two):
    *
    *   score(q, d) = Σ_{t∈q} qtf·ln((tf + μ·P(t|C)) / (dl + μ))
    *
    * computed via the Zhai–Lafferty decomposition
    * `Σ_{matched} qtf·ln(1 + tf·C/(μ·cf)) + qconst − |q|·ln(dl+μ)` with
    * `qconst = Σ_{t∈q} qtf·ln(μ·cf/C)` — a sparse matched-term sum, one
    * per-QUERY scalar, one per-doc term — which is what makes the plan
    * the bm25 shape: candidates form ONLY through (broadcast)
    * query-vocabulary term joins, never corpus×queries×vocabulary. The
    * released value is the TRUE query log-likelihood (spec-checked
    * against the undecomposed formula), not just a rank-equivalent.
    * Docs sharing no term with the query never become candidates (the
    * bm25 candidate convention; their constant-only scores are strictly
    * dominated in practice and top-k never reaches them on this corpus).
    *
    * Cross-engine exactness: tf·C and μ·cf are exact integer products in
    * doubles; each matched term is ONE fixed expression; the matched sum
    * is reassociation-noisy so the release rounds AFTER adding the
    * per-doc constant and ranking uses the rounded score (the bm25
    * armor). Query set: the pinned serving batch.
    */
  def qldTopK(spark: SparkSession, dir: String, k: Int = 10,
      mu: Double = QldMu): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist()
    val cf = tf.groupBy("tok").agg(sum("tf").as("cf"))
    val totC = tf.agg(sum("tf").as("c_total"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val out = qldServe(tf.join(dl, Seq("doc_id")), cf, totC, k, mu)
      .localCheckpoint(true) // bounded; release the tf cache
    tf.unpersist()
    out
  }

  /** The QLD serving core over prebuilt model legs (postings WITH the
    * per-doc length attached — the [[LexModel]] norms-in-postings layout,
    * so scoring needs no per-doc join — plus per-term collection
    * frequency and the collection-size scalar) — shared verbatim by the
    * one-shot [[qldTopK]] and the indexed [[qldTopKIndexed]], so parity
    * is structural. Per-serve work: the broadcast query-vocabulary joins
    * and the sparse matched-term sum; `dl` rides the candidate rows
    * through the grouping key (constant per doc — no value change). */
  private[graft] def qldServe(tfd: DataFrame, cf: DataFrame, totC: DataFrame,
      k: Int = 10, mu: Double = QldMu): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qt = tfd.filter(col("doc_id") <= ServeBatchMaxId)
      .select(col("doc_id").as("q_id"), col("tok"), col("tf").as("qtf"))
    // per-(query, term) model stats — query-vocabulary-sized, broadcast
    val qstats = qt.join(cf, Seq("tok")).crossJoin(broadcast(totC))
    val qagg = qstats.groupBy("q_id").agg(
      sum("qtf").as("qlen"),
      sum(col("qtf") * log(lit(mu) * col("cf") / col("c_total"))).as("qconst"))
    val sparse = tfd.join(broadcast(qstats), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("s", col("qtf") *
        log(lit(1.0) + (col("tf") * col("c_total")) / (lit(mu) * col("cf"))))
      .groupBy("q_id", "doc_id", "dl").agg(sum(col("s")).as("sp"))
    val scored = sparse
      .join(broadcast(qagg), Seq("q_id"))
      .select(col("q_id"), col("doc_id"),
        round(col("sp") + col("qconst") - col("qlen") * log(col("dl") + lit(mu)), 4)
          .as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("score"))
      .orderBy("q_id", "rank")
  }

  /** INDEXED QLD serving — [[qldTopK]]'s exact twin riding the
    * session-held model over the written postings snapshot: the language
    * model's statistics (cf, C, dl) are mergeable aggregates of the
    * postings stored by [[servedLexModel]] (dl attached to the stored
    * postings row), so the indexed serve is exact by construction and a
    * query pays only the serving tail. Same oracle as the one-shot form. */
  def qldTopKIndexed(spark: SparkSession, dir: String, k: Int = 10,
      mu: Double = QldMu): DataFrame = {
    val m = servedLexModel(spark, dir)
    qldServe(m.tfb, m.dfi.select("tok", "cf"), m.stats.select("c_total"), k, mu)
  }

  /** Static EXACT oracle for [[qldTopK]] — the decomposition restated
    * with the identical op order (integer products, one division per
    * term, round after the constant add). */
  def qldTopKSql(k: Int = 10, mu: Double = QldMu): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), tf AS MATERIALIZED (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
       |), cf AS MATERIALIZED (
       |  SELECT tok, sum(tf) AS cf FROM tf GROUP BY 1
       |), tot AS (
       |  SELECT sum(tf) AS c_total FROM tf
       |), dl AS MATERIALIZED (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
       |), qt AS MATERIALIZED (
       |  SELECT doc_id AS q_id, tok, tf AS qtf FROM tf
       |  WHERE doc_id <= $ServeBatchMaxId
       |), qagg AS (
       |  SELECT q.q_id, sum(q.qtf) AS qlen,
       |    sum(q.qtf * ln($mu * cf.cf / tot.c_total)) AS qconst
       |  FROM qt q JOIN cf USING (tok) CROSS JOIN tot
       |  GROUP BY 1
       |), sparse AS (
       |  SELECT q.q_id, t.doc_id,
       |    sum(q.qtf * ln(1.0 + (t.tf * tot.c_total) / ($mu * cf.cf))) AS sp
       |  FROM tf t
       |  JOIN qt q USING (tok)
       |  JOIN cf USING (tok)
       |  CROSS JOIN tot
       |  WHERE t.doc_id <> q.q_id
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT s.q_id, s.doc_id,
       |    round(s.sp + qa.qconst - qa.qlen * ln(dl.dl + $mu), 4) AS score
       |  FROM sparse s
       |  JOIN dl ON dl.doc_id = s.doc_id
       |  JOIN qagg qa ON qa.q_id = s.q_id
       |)
       |SELECT q_id, doc_id, rank, score FROM (
       |  SELECT q_id, doc_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank,
       |    score
       |  FROM scored)
       |WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** Per-language quality pruning: keep the top `keepFrac` of each
    * language's documents by [[qualityScore]], rank ties broken by doc_id —
    * the curation step that follows scoring in a training pipeline (prune
    * per language, never globally, so low-resource languages aren't wiped
    * out by a quality distribution shifted against them).
    *
    * Exactly-fractional semantics need a per-language rank, which is a
    * per-language sort — a single task per language, so a corpus-dominant
    * language (English at ~half of a real crawl) makes this the
    * correctness ANCHOR, not the scale path. The benched scale path is
    * [[qualityPruneApprox]]: a per-language score THRESHOLD from an
    * approximate quantile (one pass, no sort anywhere) at the cost of
    * over-keeping the boundary tie class — the same exact-anchor /
    * approx-benched convention as `value_quartiles` /
    * `value_quartiles_approx`.
    */
  def qualityPrune(spark: SparkSession, dir: String, keepFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityScore(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"), Seq("doc_id"))
    val byLang = Window.partitionBy("lang")
    val w = byLang.orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("lang_rank", row_number().over(w))
      .withColumn("n_lang", count(lit(1)).over(byLang))
      .filter(col("lang_rank") <= ceil(lit(keepFrac) * col("n_lang")))
      .select(col("doc_id"), col("lang"), col("quality"), col("lang_rank"))
      .orderBy("doc_id")
  }

  def qualityPruneSql: String =
    s"""WITH scored AS (
       |${qualityScoreSql.stripSuffix("\nORDER BY doc_id")}
       |), ranked AS (
       |  SELECT s.doc_id, d.lang, s.quality,
       |    row_number() OVER (PARTITION BY d.lang
       |                       ORDER BY s.quality DESC, s.doc_id) AS lang_rank,
       |    count(*) OVER (PARTITION BY d.lang) AS n_lang
       |  FROM scored s JOIN documents d USING (doc_id)
       |)
       |SELECT doc_id, lang, quality, lang_rank
       |FROM ranked WHERE lang_rank <= ceil(0.5 * n_lang)
       |ORDER BY doc_id""".stripMargin

  /** Scale path for [[qualityPrune]]: per-language quality THRESHOLD from
    * `percentile_approx` (keep everything scoring at or above the
    * language's (1−keepFrac) quantile) instead of an exact per-language
    * rank. Plan shape: one hash aggregate down to a rows-per-language
    * frame (map-side partials, O(langs) rows), broadcast back, scan and
    * filter — no window, no sort, no single-task language partition; a
    * corpus-dominant language costs the same as any other scan share.
    * Semantics envelope (spec-pinned vs the exact rank): the kept set is
    * downward-closed in quality and differs from the exact top-keepFrac
    * only within the boundary tie class — every doc strictly above the
    * threshold is kept, none strictly below it survives. No DuckDB oracle:
    * the quantile sketch (KLL) is engine-specific, like the other
    * `_approx` twins — the envelope spec vs [[qualityPrune]] is the gate.
    */
  def qualityPruneApprox(spark: SparkSession, dir: String,
      keepFrac: Double = 0.5): DataFrame = {
    val scored = qualityScore(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"), Seq("doc_id"))
    val thresholds = scored.groupBy("lang")
      .agg(percentile_approx(col("quality"), lit(1.0 - keepFrac), lit(10000))
        .as("q_thresh"))
    scored.join(broadcast(thresholds), "lang")
      .filter(col("quality") >= col("q_thresh"))
      .select(col("doc_id"), col("lang"), col("quality"),
        col("q_thresh"))
      .orderBy("doc_id")
  }

  val winnowFingerprintsSql: String =
    """WITH grams AS (
      |  SELECT doc_id, length(text) - 7 AS m, text,
      |    unnest(range(1, length(text) - 6)) AS p
      |  FROM documents
      |  WHERE length(text) >= 8
      |), signed AS (
      |  SELECT doc_id, m, p,
      |    ((CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616 ELSE hu END))::BIGINT AS h
      |  FROM (
      |    SELECT doc_id, m, p,
      |      (ord(substr(text, p+0, 1))::HUGEINT * 74051159531521793
      |       + ord(substr(text, p+1, 1))::HUGEINT * 288136807515649
      |       + ord(substr(text, p+2, 1))::HUGEINT * 1121154893057
      |       + ord(substr(text, p+3, 1))::HUGEINT * 4362470401
      |       + ord(substr(text, p+4, 1))::HUGEINT * 16974593
      |       + ord(substr(text, p+5, 1))::HUGEINT * 66049
      |       + ord(substr(text, p+6, 1))::HUGEINT * 257
      |       + ord(substr(text, p+7, 1))::HUGEINT) % 18446744073709551616 AS hu
      |    FROM grams)
      |), win AS (
      |  SELECT doc_id, m, p,
      |    min({'h': h, 'np': -p}) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS sel
      |  FROM signed
      |), picked AS (
      |  SELECT doc_id, (sel).h AS fp FROM win WHERE m > 16 AND p <= m - 15
      |  UNION ALL
      |  SELECT doc_id, (min({'h': h, 'np': -p})).h AS fp
      |  FROM signed WHERE m <= 16 GROUP BY doc_id
      |), agg AS (
      |  SELECT doc_id, count(DISTINCT fp) AS n_fp, min(fp) AS fp_min, max(fp) AS fp_max
      |  FROM picked GROUP BY doc_id
      |)
      |SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp, a.fp_min, a.fp_max
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** [[distinctiveTerms]] through the custom
    * [[graft.functions.TopKByScore]] AGGREGATE (the UDAF surface): the
    * per-doc top-k runs as a hash aggregate with map-side partial k-item
    * buffers — no Window, no per-group sort of non-survivors; only
    * ≤ k items per group per map task ever shuffle. Output contract is
    * IDENTICAL to the window form (same oracle; parity + plan specs).
    */
  def distinctiveTermsAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docTerm = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = docTerm.groupBy("token").agg(count(lit(1)).as("df"))
    docTerm.join(broadcast(df), Seq("token"))
      .withColumn("raw_score", col("tf").cast("double") / col("df"))
      .groupBy("doc_id")
      .agg(graft.functions.TopKByScore(
        col("raw_score"), col("token"), col("tf"), col("df"), k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.token").as("token"), col("t.tf").as("tf"), col("t.df").as("df"),
        round(col("t.raw_score"), 6).as("score"))
      .orderBy("doc_id", "rank")
  }

  /** Default phrase for the registered query — chosen to occur often
    * enough at every SF that the per-doc hit counts and top-k ordering do
    * real work. */
  val DefaultPhrase: Seq[String] = Seq("table", "scan")

  /** Exact-phrase search over a POSITIONAL inverted index — the retrieval
    * capability [[bm25TopK]]'s bag-of-words index cannot express (BM25
    * scores "table" and "scan" anywhere; this matches "table scan"
    * adjacently). The index is (doc, term, position).
    *
    * ONE-PASS formulation (not the textbook k−1 postings self-joins,
    * which scan the index once per phrase term): each posting of phrase
    * term w at position p votes for every candidate START it could
    * support — `start = p − offset(w)` per offset of w in the phrase —
    * and a start with votes at ALL k offsets is an occurrence. One index
    * scan (the `tok ∈ phrase` filter pushes into it, so only the phrase
    * terms' postings are read — a bucket-pruned read on a term-bucketed
    * index table), one (doc, start) aggregate, one per-doc count,
    * TakeOrderedAndProject top-k. No self-join, so the index subtree is
    * never re-evaluated per term. Repeated phrase words are handled by
    * the per-term OFFSET SET (a posting votes once per offset); overlaps
    * count in both engines ("a a a" contains "a a" twice). The oracle
    * keeps the independent join formulation — two different shapes, one
    * answer.
    */
  def phraseSearchOf(docs: DataFrame, phrase: Seq[String] = DefaultPhrase,
      k: Int = 10): DataFrame = {
    require(phrase.nonEmpty)
    val offsets: Map[String, Seq[Int]] =
      phrase.zipWithIndex.groupMap(_._1)(_._2)
    val offsetsOf = offsets.foldLeft(lit(null).cast("array<int>")) {
      case (acc, (w, offs)) =>
        when(col("tok") === w, array(offs.map(lit): _*)).otherwise(acc)
    }
    docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("pos"), explode(offsetsOf).as("off"))
      .select(col("doc_id"), (col("pos") - col("off")).as("start"), col("off"))
      .groupBy("doc_id", "start")
      // a start is an occurrence iff all k offsets voted; offsets within a
      // (doc, start) are distinct by construction (one token position
      // votes a given offset exactly once)
      .agg(count(lit(1)).as("n_off"))
      .filter(col("n_off") === phrase.length)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(k)
  }

  /** [[phraseSearchOf]] on the documents table. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearchOf(Tables(spark, dir, "documents"))

  /** Top collocations by PMI — pointwise mutual information over token
    * co-occurrence within a ±`window` neighborhood, the count-based
    * distributional-semantics statistic (word2vec's SGNS factorizes
    * exactly this matrix — Levy & Goldberg, NeurIPS'14). Surfaces learned
    * phrases ("big dup") that raw frequency ranks bury under stopword
    * pairs, because PMI normalizes by both marginals.
    *
    * Exactness: PMI = log(p(ab)/(p(a)p(b))) needs no libm log to RANK —
    * log is monotone, so ranking on the raw ratio (n_ab·N)/(n_a·n_b) is
    * the same order, and that ratio is ONE IEEE division of two exact
    * integer products (< 2⁵³ through sf1; at crawl scale the products
    * overflow and ordering would move to log space — the documented
    * envelope, same convention as the BIGINT fixed-point notes).
    *
    * Scale shape: the Spark side generates pairs STRAIGHT OFF the token
    * array with nested higher-order transforms — zero joins and zero
    * shuffles until the (a,b) count aggregate; the oracle keeps the
    * textbook positional self-join (two shapes, one answer — the
    * [[phraseSearchOf]] convention). The min-count filter prunes the
    * pair universe before the marginal joins, so only surviving
    * collocations join the marginal table.
    */
  def pmiPairs(spark: SparkSession, dir: String, window: Int = 2,
      minCount: Int = 5, k: Int = 100): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    // (x, i) is the token at 0-based i; slice is 1-based, so i+2 starts at
    // the NEXT token — each position pairs with its `window` successors
    val pairs = toks.select(explode(expr(
      s"""flatten(transform(tk, (x, i) ->
         |  transform(slice(tk, i + 2, $window),
         |    y -> struct(least(x, y) AS a, greatest(x, y) AS b))))""".stripMargin))
      .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    val cooc = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val ex = toks.select(explode(col("tk")).as("tok"))
    val marg = ex.groupBy("tok").agg(count(lit(1)).as("n"))
    val total = ex.agg(count(lit(1)).as("nn"))
    cooc
      .join(marg.select(col("tok").as("a"), col("n").as("n_a")), Seq("a"))
      .join(marg.select(col("tok").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(total)
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab") * col("nn")).cast("double") / (col("n_a") * col("n_b")))
          .as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Per-doc top-3 longest tokens — deliberately solved ENTIRELY with
    * higher-order array functions (distinct → comparator sort → slice →
    * join), zero explodes and zero shuffles except the output sort: the
    * array-HOF surface (`transform`/`array_sort`-with-lambda/`slice`)
    * that the explode-and-reaggregate idiom hides. Per-row work is
    * bounded by the token array; at 100 TB this is a pure map stage.
    * Order: length descending, then lexicographic — total, so the result
    * is deterministic and the oracle exact (emitted as a joined string:
    * nested arrays don't survive the driver's hash compare).
    */
  def docTopTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), expr(
        """array_join(slice(array_sort(array_distinct(tk),
          |  (a, b) -> CASE WHEN length(a) > length(b) THEN -1
          |                 WHEN length(a) < length(b) THEN 1
          |                 WHEN a < b THEN -1 WHEN a > b THEN 1
          |                 ELSE 0 END), 1, 3), ' ')""".stripMargin)
        .as("top_tokens"))
      .orderBy("doc_id")

  val docTopTokensSql: String =
    """SELECT doc_id,
      |  array_to_string(
      |    list_transform(
      |      list_sort(list_transform(
      |        list_distinct(regexp_split_to_array(lower(text), '\s+')),
      |        x -> {'k': -length(x), 't': x})),
      |      s -> s.t)[1:3], ' ') AS top_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus-drift divergence — which terms distinguish one corpus slice
    * from another (sources 0–9 vs 10–19 here; in production: this week's
    * crawl vs last week's, or candidate data vs the training mix). The
    * statistic is the smoothed ODDS RATIO per token (the monotone core of
    * the Monroe et al. log-odds "fightin' words" family — log dropped
    * because it is rank-preserving and libm-rounded): with add-one
    * smoothing, OR = ((n_a+1)(N_b−n_b+1)) / ((n_b+1)(N_a−n_a+1)), and the
    * divergence score is max(OR, 1/OR) so both directions rank together.
    * Exact everywhere: integer products (< 2⁵³ through sf1) into single
    * IEEE divisions. Totals are over the COMPARED vocabulary (tokens past
    * the noise floor) — a defined contract both engines share.
    *
    * Scale shape: one explode + one hash agg with conditional sums (no
    * per-half scans), a 1-row scalar-combine for the totals, top-k via
    * TakeOrderedAndProject.
    */
  def vocabDivergence(spark: SparkSession, dir: String,
      minCount: Int = 20, k: Int = 50): DataFrame = {
    val half = when(
      regexp_extract(col("source"), "[0-9]+", 0).cast("int") < 10, "a")
      .otherwise("b")
    val counts = Tables(spark, dir, "documents")
      .select(half.as("half"), explode(tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("half") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("half") === "b", 1L).otherwise(0L)).as("n_b"))
      .filter(col("n_a") + col("n_b") >= minCount)
    val tot = counts.agg(sum(col("n_a")).as("na"), sum(col("n_b")).as("nb"))
    val or = ((col("n_a") + 1) * (col("nb") - col("n_b") + 1)).cast("double") /
      ((col("n_b") + 1) * (col("na") - col("n_a") + 1))
    val orInv = ((col("n_b") + 1) * (col("na") - col("n_a") + 1)).cast("double") /
      ((col("n_a") + 1) * (col("nb") - col("n_b") + 1))
    counts.crossJoin(tot)
      .select(col("tok"), col("n_a"), col("n_b"),
        greatest(or, orInv).as("div_score"))
      .orderBy(col("div_score").desc, col("tok"))
      .limit(k)
  }

  val vocabDivergenceSql: String =
    """WITH halves AS (
      |  SELECT CASE WHEN regexp_extract(source, '[0-9]+')::INT < 10
      |    THEN 'a' ELSE 'b' END AS half,
      |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
      |  FROM documents
      |), counts AS (
      |  SELECT tok,
      |    sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END)::BIGINT AS n_a,
      |    sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END)::BIGINT AS n_b
      |  FROM halves GROUP BY tok HAVING count(*) >= 20
      |), tot AS (SELECT sum(n_a) AS na, sum(n_b) AS nb FROM counts)
      |SELECT tok, n_a, n_b,
      |  greatest(((n_a+1)*(nb-n_b+1))::DOUBLE / ((n_b+1)*(na-n_a+1)),
      |           ((n_b+1)*(na-n_a+1))::DOUBLE / ((n_a+1)*(nb-n_b+1)))
      |    AS div_score
      |FROM counts, tot
      |ORDER BY div_score DESC, tok LIMIT 50""".stripMargin

  val pmiPairsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      |), idx AS (
      |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM toks
      |), cooc AS (
      |  SELECT least(a.tok, b.tok) AS a, greatest(a.tok, b.tok) AS b,
      |    count(*) AS n_ab
      |  FROM idx a JOIN idx b
      |    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
      |  WHERE a.tok != b.tok GROUP BY 1, 2 HAVING count(*) >= 5
      |), marg AS (SELECT tok, count(*) AS n FROM idx GROUP BY tok),
      |tot AS (SELECT count(*) AS nn FROM idx)
      |SELECT a, b, n_ab, ma.n AS n_a, mb.n AS n_b,
      |  (n_ab * nn)::DOUBLE / (ma.n * mb.n) AS pmi_ratio
      |FROM cooc JOIN marg ma ON ma.tok = a JOIN marg mb ON mb.tok = b, tot
      |ORDER BY pmi_ratio DESC, a, b LIMIT 100""".stripMargin

  val phraseSearchSql: String = {
    val joins = DefaultPhrase.zipWithIndex.tail.map { case (w, i) =>
      s"JOIN (SELECT doc_id, pos - $i AS pos FROM idx WHERE tok = '$w') m$i USING (doc_id, pos)"
    }.mkString("\n|")
    s"""WITH idx AS (
       |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS pos
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
       |        FROM documents)
       |)
       |SELECT doc_id, count(*) AS n_hits
       |FROM (SELECT doc_id, pos FROM idx WHERE tok = '${DefaultPhrase.head}') m0
       |$joins
       |GROUP BY doc_id
       |ORDER BY n_hits DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  /** Head size for [[zipfFit]]: the fit runs over the top-R terms. */
  val ZipfHead = 100

  /** Zipf rank–frequency fit — the corpus-statistics screen (Zipf '49;
    * Piantadosi, Psychon Bull Rev '14): regress ln(count) on ln(rank)
    * over the vocabulary head and report slope (≈ −1 for natural text;
    * far-off values flag synthetic/boilerplate corpora), intercept, and
    * R². One of the standard "does this crawl look like language"
    * audits next to [[langId]] and the length histogram.
    *
    * Exactness contract (the [[graft.ops.Events.hourValueRegression]]
    * discipline, extended to log space): each regression point derives
    * from INTEGERS (rank, count), so ln(r), ln(c) and their products are
    * per-row-deterministic doubles; each is cast to DECIMAL(24,12)
    * before summation, so every MOMENT is an exact order-free decimal
    * sum, and slope/intercept/R² are fixed IEEE trees over the moments
    * cast back to double. SUM reassociation — the only cross-engine
    * nondeterminism — never touches a float.
    *
    * Scale shape: token counts are one two-level aggregate
    * (vocabulary-sized output); the head is TakeOrderedAndProject over
    * the vocab; the window and the moment aggregate see [[ZipfHead]]
    * rows — constants, not corpus.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFitOf(Tables(spark, dir, "documents"))

  /** [[zipfFit]] over any `(text)` frame (library surface). */
  def zipfFitOf(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cnt"), asc("tok"))
    val dec = "decimal(24,12)"
    val pts = docs
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tok")).limit(ZipfHead)
      .withColumn("r", row_number().over(w))
      .select(log(col("r").cast("double")).as("lx"),
        log(col("cnt").cast("double")).as("ly"))
    val m = pts.agg(count(lit(1)).as("n"),
      sum(col("lx").cast(dec)).as("sx"),
      sum((col("lx") * col("lx")).cast(dec)).as("sxx"),
      sum(col("ly").cast(dec)).as("sy"),
      sum((col("ly") * col("ly")).cast(dec)).as("syy"),
      sum((col("lx") * col("ly")).cast(dec)).as("sxy"))
    val (n, sx, sxx, sy, syy, sxy) =
      (col("n").cast("double"), col("sx").cast("double"),
        col("sxx").cast("double"), col("sy").cast("double"),
        col("syy").cast("double"), col("sxy").cast("double"))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val slope = cov / varx
    m.select(col("n").as("n_terms"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept"),
      round(cov * cov / (varx * vary), 6).as("r2"))
  }

  val zipfFitSql: String =
    s"""WITH tc AS (
       |  SELECT tok, count(*) AS cnt
       |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
       |        FROM documents)
       |  GROUP BY tok
       |), top AS (
       |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS r
       |  FROM tc ORDER BY cnt DESC, tok LIMIT $ZipfHead
       |), pts AS (
       |  SELECT ln(r::DOUBLE) AS lx, ln(cnt::DOUBLE) AS ly FROM top
       |), m AS (
       |  SELECT count(*) AS n,
       |    sum(lx::DECIMAL(24,12)) AS sx, sum((lx*lx)::DECIMAL(24,12)) AS sxx,
       |    sum(ly::DECIMAL(24,12)) AS sy, sum((ly*ly)::DECIMAL(24,12)) AS syy,
       |    sum((lx*ly)::DECIMAL(24,12)) AS sxy
       |  FROM pts
       |)
       |SELECT n AS n_terms,
       |  round(slope, 6) AS slope,
       |  round((sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE, 6) AS intercept,
       |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |      * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |    / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |       * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS r2
       |FROM (SELECT *,
       |  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope FROM m)""".stripMargin



  /** Language-ID confusion matrix — the evaluation view of [[langId]]:
    * cells (labeled × predicted) with counts and the within-label share
    * (the recall decomposition); the diagonal share IS per-class recall.
    * The screen that turns the heuristic classifier into a measured one
    * before anyone trusts its routing decisions.
    *
    * Scale shape: the per-doc prediction is [[langId]]'s one codegen
    * projection; the matrix is one hash aggregate to the (langs+1)²
    * bounded grid plus a grid-sized totals join. Exact integers
    * throughout; one division per cell.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .groupBy("labeled", "predicted").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("labeled").agg(sum("n").as("tot"))
    cells.join(totals, "labeled")
      .select(col("labeled"), col("predicted"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6).as("row_frac"))
      .orderBy("labeled", "predicted")
  }

  val langIdConfusionSql: String = {
    val core = langIdSql.replaceAll("\\s*ORDER BY doc_id\\s*$", "")
    s"""WITH pred AS (
       |$core
       |), cells AS (
       |  SELECT labeled, predicted, count(*) AS n FROM pred GROUP BY 1, 2
       |), totals AS (
       |  SELECT labeled, sum(n)::BIGINT AS tot FROM cells GROUP BY 1
       |)
       |SELECT labeled, predicted, n, round(n::DOUBLE / tot::DOUBLE, 6) AS row_frac
       |FROM cells JOIN totals USING (labeled)
       |ORDER BY labeled, predicted""".stripMargin
  }

  /** Pairs reported by [[sourceVocabOverlap]]. */
  val VocabOverlapK = 20

  /** Cross-source vocabulary overlap — pairwise Jaccard similarity of
    * the sources' token SETS, the "which feeds are the same content
    * under two names" screen that runs before near-dup pair mining: two
    * mirrors show up here at vocabulary level for the cost of a
    * vocabulary join, long before any document pair is materialized.
    *
    * Exactness: |A∩B| from an equi-join on the (source, token) distinct
    * set, |A|,|B| from its marginals — Jaccard is one division over
    * exact integers, rounded 6; top pairs break ties by name so the
    * selected set is deterministic.
    *
    * Scale shape: everything downstream of the first aggregate is
    * VOCABULARY-sized (distinct (source, token)), never corpus-sized;
    * the self-join fans out at most |sources|² per token. The corpus is
    * scanned once.
    */
  def sourceVocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sv = Tables(spark, dir, "documents")
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = sv.groupBy("source").agg(count(lit(1)).as("nv"))
    val inter = sv.as("a").join(sv.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("nv").as("na")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("nv").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("inter"), col("na"), col("nb"),
        round(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
      .orderBy(desc("jaccard"), col("src_a"), col("src_b"))
      .limit(VocabOverlapK)
  }

  val sourceVocabOverlapSql: String =
    s"""WITH sv AS (
       |  SELECT DISTINCT source, tok FROM (
       |    SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
       |    FROM documents)
       |), sizes AS (
       |  SELECT source, count(*) AS nv FROM sv GROUP BY 1
       |), pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
       |  FROM sv a JOIN sv b ON a.tok = b.tok AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT src_a, src_b, inter, na, nb,
       |  round(inter::DOUBLE / (na + nb - inter)::DOUBLE, 6) AS jaccard
       |FROM (SELECT p.*, sa.nv AS na, sb.nv AS nb
       |      FROM pairs p
       |      JOIN sizes sa ON sa.source = p.src_a
       |      JOIN sizes sb ON sb.source = p.src_b)
       |ORDER BY jaccard DESC, src_a, src_b
       |LIMIT $VocabOverlapK""".stripMargin

  /** Mutual information between the corpus's two composition axes
    * (lang × source) — the dependence screen a mixing job runs before
    * treating the axes as independent strata: MI ≈ 0 says source shares
    * are language-independent (stratify on either); large MI says the
    * grid is skewed and per-cell budgets are needed. Reported with both
    * marginal entropies and the normalized coefficient
    * mi / min(H(lang), H(source)) ∈ [0, 1].
    *
    * Exactness: every probability is a ratio of exact counts, each
    * cell/marginal term is a per-row-deterministic double cast to
    * DECIMAL(24,12) before summation ([[zipfFit]]'s order-free moment
    * discipline), and the published scalars are fixed IEEE trees over
    * the exact sums, rounded to 6.
    *
    * Scale shape: one hash aggregate to the (lang × source) grid —
    * bounded by the attribute domains — then arithmetic on grid-sized
    * frames; the corpus is scanned once.
    */
  def langSourceMi(spark: SparkSession, dir: String): DataFrame =
    langSourceMiOf(Tables(spark, dir, "documents"))

  /** [[langSourceMi]] over any `(lang, source)` frame (library surface). */
  def langSourceMiOf(docs: DataFrame): DataFrame = {
    val dec = "decimal(24,12)"
    val cells = docs
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
    val lm = cells.groupBy("lang").agg(sum("c").as("cl"))
    val sm = cells.groupBy("source").agg(sum("c").as("cs"))
    val nn = cells.agg(sum("c").as("nn"))
    def d(c: Column) = c.cast("double")
    val mi = cells.join(lm, "lang").join(sm, "source").crossJoin(broadcast(nn))
      .select(((d(col("c")) / d(col("nn")))
        * log(d(col("c")) * d(col("nn")) / (d(col("cl")) * d(col("cs")))))
        .cast(dec).as("t"))
      .agg(count(lit(1)).as("n_cells"), sum("t").as("mi_d"))
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.crossJoin(broadcast(nn))
        .select((-(d(col(cnt)) / d(col("nn")))
          * log(d(col(cnt)) / d(col("nn")))).cast(dec).as("t"))
        .agg(sum("t").as(out))
    mi.crossJoin(entropy(lm, "cl", "hl_d")).crossJoin(entropy(sm, "cs", "hs_d"))
      .select(col("n_cells"),
        round(d(col("mi_d")), 6).as("mi"),
        round(d(col("hl_d")), 6).as("h_lang"),
        round(d(col("hs_d")), 6).as("h_source"),
        round(d(col("mi_d")) / least(d(col("hl_d")), d(col("hs_d"))), 6)
          .as("mi_norm"))
  }

  val langSourceMiSql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2
      |), lm AS (SELECT lang, sum(c)::BIGINT AS cl FROM cells GROUP BY 1
      |), sm AS (SELECT source, sum(c)::BIGINT AS cs FROM cells GROUP BY 1
      |), nn AS (SELECT sum(c)::BIGINT AS nn FROM cells
      |), mi AS (
      |  SELECT count(*) AS n_cells, sum(t) AS mi_d FROM (
      |    SELECT ((c::DOUBLE / nn::DOUBLE)
      |      * ln(c::DOUBLE * nn::DOUBLE / (cl::DOUBLE * cs::DOUBLE)))::DECIMAL(24,12) AS t
      |    FROM cells JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN nn)
      |), hl AS (
      |  SELECT sum(t) AS hl_d FROM (
      |    SELECT (-(cl::DOUBLE / nn::DOUBLE)
      |      * ln(cl::DOUBLE / nn::DOUBLE))::DECIMAL(24,12) AS t
      |    FROM lm CROSS JOIN nn)
      |), hs AS (
      |  SELECT sum(t) AS hs_d FROM (
      |    SELECT (-(cs::DOUBLE / nn::DOUBLE)
      |      * ln(cs::DOUBLE / nn::DOUBLE))::DECIMAL(24,12) AS t
      |    FROM sm CROSS JOIN nn)
      |)
      |SELECT n_cells, round(mi_d::DOUBLE, 6) AS mi,
      |  round(hl_d::DOUBLE, 6) AS h_lang, round(hs_d::DOUBLE, 6) AS h_source,
      |  round(mi_d::DOUBLE / least(hl_d::DOUBLE, hs_d::DOUBLE), 6) AS mi_norm
      |FROM mi CROSS JOIN hl CROSS JOIN hs""".stripMargin

  /** Stored-query count for [[percolateAlerts]]: the top
    * `2 × PercolateQueries` document-frequency terms pair into
    * `PercolateQueries` two-term conjunctive queries (rank i AND rank
    * i+m) — derived from the corpus itself so both engines register the
    * identical query set. Sized to the synthetic corpus's ~31-token
    * vocabulary; real deployments register thousands — the plan shape
    * (one pass, broadcast query terms) is what scales, not m. */
  val PercolateQueries = 10

  /** Percolation / reverse search — M STORED queries matched against the
    * corpus in ONE pass (the Elasticsearch-percolator / alerting shape:
    * "which standing alerts does each incoming document trigger?"). The
    * naive form runs M corpus scans; this inverts it: the query-term
    * table (|2M| rows) broadcasts onto the distinct per-doc token stream,
    * and a conjunctive query fires for a doc iff its matched-term count
    * equals the query's term count — an aggregate, not a scan per query.
    *
    * Scale shape: one corpus scan → per-doc distinct tokens (map-side
    * `array_distinct`, no shuffle); broadcast join against the tiny
    * query-term table; one (query, doc) hash aggregate whose input is
    * bounded by matches (≤ docs × query-terms-per-doc), then a
    * |queries|-bounded rollup. Queries with zero firing docs survive via
    * the left re-attach (null first/last doc).
    */
  /** Per-doc distinct token stream — shared by the batch query and the
    * streaming percolator (map-side `array_distinct`, no shuffle). */
  private[graft] def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(Dedup.tokens(col("text")))).as("token"))

  /** Register the stored-query set off a corpus: the top-2m df terms
    * paired rank i / i+m. Bounded deterministic driver fit (2m rows). */
  private[graft] def percolateQuerySet(spark: SparkSession,
      docTok: DataFrame, m: Int = PercolateQueries): DataFrame = {
    import spark.implicits._
    val top = docTok.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(2 * m)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, df) => (-df, t) }.map(_._1)
    (0 until m).map(i => (i.toLong, top(i), top(i + m)))
      .toDF("query_id", "term_a", "term_b")
  }

  /** The conjunctive match core — (query_id, doc_id) pairs where the doc
    * holds BOTH query terms. Shared VERBATIM by the batch rollup and the
    * streaming percolator, so the streamed alert set is definitionally
    * the batch predicate. */
  private[graft] def firedPairs(docTok: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries.select(col("query_id"),
      explode(array(col("term_a"), col("term_b"))).as("token"))
    docTok.join(broadcast(qterms), Seq("token"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("matched"))
      .filter(col("matched") === 2)
      .select("query_id", "doc_id")
  }

  def percolateAlerts(spark: SparkSession, dir: String): DataFrame = {
    val docTok = docTokens(Tables(spark, dir, "documents"))
    // the registered query set becomes PLAN LITERALS — no window, no
    // tiny-frame self-join
    val queries = percolateQuerySet(spark, docTok)
    val fired = firedPairs(docTok, queries)
      .groupBy("query_id").agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    // no broadcast hint: the preserved side of a left-outer cannot build
    // the hash side, and `fired` is already |queries|-bounded
    queries.join(fired, Seq("query_id"), "left")
      .select(col("query_id"), col("term_a"), col("term_b"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("first_doc"), col("last_doc"))
      .orderBy("query_id")
  }

  /** Boolean-percolator sizing: [[PercolateBoolQueries]] stored queries,
    * each `p1 AND p2 AND p3 AND NOT n` over the corpus's top-df terms
    * (query i takes ranks i, i+m, i+2m as positives and i+3m as the
    * negation) — 4m ≤ |vocab| keeps the derivation total. */
  val PercolateBoolQueries = 6
  val PercolateBoolK = 3

  /** Generalized percolation — k-term CONJUNCTIONS with NOT terms, still
    * ONE corpus pass + one broadcast query-term table ([[percolateAlerts]]
    * is the 2-term special case; this is the full Elasticsearch-percolator
    * boolean shape). A signed term table (query_id, token, neg) broadcasts
    * onto the per-doc distinct token stream; a query fires for a doc iff
    * its positive-hit count equals k AND its negative-hit count is zero —
    * one (query, doc) aggregate, no scan per query, no second corpus
    * touch. Docs matching no term of a query never reach the aggregate,
    * which is correct exactly because every query carries ≥ 1 positive
    * term (pure-NOT queries are rejected, the standard percolator
    * restriction).
    */
  private[graft] def percolateBoolQuerySet(spark: SparkSession,
      docTok: DataFrame, m: Int = PercolateBoolQueries,
      k: Int = PercolateBoolK): DataFrame = {
    import spark.implicits._
    val top = docTok.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit((k + 1) * m)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, df) => (-df, t) }.map(_._1)
    require(top.length >= (k + 1) * m,
      s"vocabulary too small for $m boolean queries of $k+1 terms")
    (0 until m).map { i =>
      (i.toLong, (0 until k).map(j => top(i + j * m)).mkString(","), top(i + k * m))
    }.toDF("query_id", "pos_terms", "neg_term")
  }

  /** The signed match core — (query_id, doc_id) pairs where the doc holds
    * ALL positive terms and NONE of the negated ones. */
  private[graft] def firedBoolPairs(docTok: DataFrame, queries: DataFrame,
      k: Int = PercolateBoolK): DataFrame = {
    val qterms = queries.select(col("query_id"),
        explode(split(col("pos_terms"), ",")).as("token"),
        lit(0).as("neg"))
      .unionAll(queries.select(col("query_id"),
        col("neg_term").as("token"), lit(1).as("neg")))
    docTok.join(broadcast(qterms), Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(sum(when(col("neg") === 0, 1).otherwise(0)).as("pos_hit"),
        sum(col("neg")).as("neg_hit"))
      .filter(col("pos_hit") === k && col("neg_hit") === 0)
      .select("query_id", "doc_id")
  }

  def percolateBooleanAlerts(spark: SparkSession, dir: String): DataFrame = {
    val docTok = docTokens(Tables(spark, dir, "documents"))
    val queries = percolateBoolQuerySet(spark, docTok)
    val fired = firedBoolPairs(docTok, queries)
      .groupBy("query_id").agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    queries.join(fired, Seq("query_id"), "left")
      .select(col("query_id"), col("pos_terms"), col("neg_term"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("first_doc"), col("last_doc"))
      .orderBy("query_id")
  }

  val percolateBooleanAlertsSql: String = {
    val m = PercolateBoolQueries
    s"""WITH dt AS (
      |  SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id,
      |      unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      |    FROM documents)
      |), ranked AS (
      |  SELECT token,
      |    row_number() OVER (ORDER BY count(*) DESC, token) AS rk
      |  FROM dt GROUP BY token
      |  ORDER BY count(*) DESC, token LIMIT ${4 * m}
      |), q AS (
      |  SELECT a.rk - 1 AS query_id,
      |    a.token || ',' || b.token || ',' || c.token AS pos_terms,
      |    a.token AS p1, b.token AS p2, c.token AS p3, d.token AS neg_term
      |  FROM ranked a
      |  JOIN ranked b ON b.rk = a.rk + $m
      |  JOIN ranked c ON c.rk = a.rk + ${2 * m}
      |  JOIN ranked d ON d.rk = a.rk + ${3 * m}
      |  WHERE a.rk <= $m
      |), qt AS (
      |  SELECT query_id, p1 AS token, 0 AS neg FROM q
      |  UNION ALL SELECT query_id, p2, 0 FROM q
      |  UNION ALL SELECT query_id, p3, 0 FROM q
      |  UNION ALL SELECT query_id, neg_term, 1 FROM q
      |), fired AS (
      |  SELECT query_id, count(*) AS n_docs,
      |    min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |  FROM (
      |    SELECT qt.query_id, dt.doc_id
      |    FROM dt JOIN qt USING (token)
      |    GROUP BY 1, 2
      |    HAVING sum(CASE WHEN neg = 0 THEN 1 ELSE 0 END) = $PercolateBoolK
      |       AND sum(neg) = 0)
      |  GROUP BY 1
      |)
      |SELECT q.query_id, q.pos_terms, q.neg_term,
      |  coalesce(f.n_docs, 0) AS n_docs, f.first_doc, f.last_doc
      |FROM q LEFT JOIN fired f USING (query_id)
      |ORDER BY q.query_id""".stripMargin
  }

  val percolateAlertsSql: String = {
    val m = PercolateQueries
    s"""WITH dt AS (
      |  SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id,
      |      unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      |    FROM documents)
      |), ranked AS (
      |  SELECT token,
      |    row_number() OVER (ORDER BY count(*) DESC, token) AS rk
      |  FROM dt GROUP BY token
      |  ORDER BY count(*) DESC, token LIMIT ${2 * m}
      |), q AS (
      |  SELECT a.rk - 1 AS query_id, a.token AS term_a, b.token AS term_b
      |  FROM ranked a JOIN ranked b ON b.rk = a.rk + $m
      |  WHERE a.rk <= $m
      |), qt AS (
      |  SELECT query_id, term_a AS token FROM q
      |  UNION ALL SELECT query_id, term_b FROM q
      |), fired AS (
      |  SELECT query_id, count(*) AS n_docs,
      |    min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |  FROM (
      |    SELECT qt.query_id, dt.doc_id
      |    FROM dt JOIN qt USING (token)
      |    GROUP BY 1, 2 HAVING count(*) = 2)
      |  GROUP BY 1
      |)
      |SELECT q.query_id, q.term_a, q.term_b,
      |  coalesce(f.n_docs, 0) AS n_docs, f.first_doc, f.last_doc
      |FROM q LEFT JOIN fired f USING (query_id)
      |ORDER BY q.query_id""".stripMargin
  }
}
