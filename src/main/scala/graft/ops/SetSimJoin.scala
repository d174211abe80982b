package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join with LOSSLESS prefix filtering — the
  * AllPairs/PPJoin technique (Bayardo et al. WWW'07; Xiao et al. WWW'08):
  * order every doc's shingle set by a global frequency rank and join only
  * on each set's length-(n − ⌈τ·n⌉ + 1) PREFIX. Any pair with
  * J(A,B) ≥ τ must share ≥ ⌈τ·|S|⌉ elements with both sides, so by
  * pigeonhole it shares at least one PREFIX element — candidate
  * generation provably misses nothing, unlike MinHash banding
  * ([[Dedup.minhashLshPairs]], probabilistic) — while the rarest-first
  * ordering keeps prefix df, and so join fan-out, minimal.
  *
  * This completes the near-dup triangle: brute ([[Dedup.ngramJaccardPairs]],
  * O(n²) anchor), probabilistic-candidates (MinHash+LSH), and now
  * exact-with-guarantee at scale.
  */
object SetSimJoin {

  /** τ = TauNum/TauDen = 0.6 — kept rational so the prefix length and the
    * verify predicate are pure integer arithmetic in both engines
    * (`⌈τ·n⌉ = (3n+4) div 5`; `J ≥ τ ⇔ 5·inter ≥ 3·union`).
    */
  val TauNum = 3
  val TauDen = 5

  /** Exact Jaccard ≥ 0.6 pairs over distinct 3-word shingles, prefix-
    * filtered.
    *
    * Scale shape: shingle df aggregate (one shuffle on the shingle key),
    * a per-DOC rank window (partitions bounded by doc length, never
    * corpus-sized), prefix equi-join, then candidate-only verification
    * against the per-doc shingle ARRAYS (array_intersect in the row — no
    * second corpus join). Prefix tokens are by construction the RAREST of
    * each set, so the equi-join's per-key fan-out is the df of rare
    * shingles — the same reason [[Dedup.containmentPairs]] caps df,
    * achieved here without changing the measure's universe.
    *
    * Two candidate-stage economies (both LOSSLESS — every candidate is
    * still verified exactly):
    *  - the self-join keys on `xxhash64(s)` (8 bytes through the exchange)
    *    instead of the ~20-40-byte shingle string; a hash collision can
    *    only ADD a spurious candidate, which the exact verify rejects;
    *  - PPJoin's length filter runs IN the join: J(A,B) ≥ τ forces
    *    |A∩B| ≥ τ·max(|A|,|B|) and |A∩B| ≤ min(|A|,|B|), so any
    *    qualifying pair has τ·max ≤ min — integer form
    *    `TauNum·max(na,nb) ≤ TauDen·min(na,nb)` — pruning length-skewed
    *    pairs before the distinct/verify stages ever see them.
    */
  def prefixJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    prefixJaccardPairsOf(Tables(spark, dir, "documents"))

  /** [[prefixJaccardPairs]] over any `(doc_id, text)` frame (library
    * surface — composed by [[splitLeakageAudit]]).
    */
  def prefixJaccardPairsOf(docs: DataFrame): DataFrame = {
    val arr = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("arr"))
    val sh = arr.select(col("doc_id"), explode(col("arr")).as("s"))
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    // Persisted AND eagerly materialized: the prefix index feeds BOTH
    // sides of the candidate self-join. Lazy persist left the two join
    // legs to populate the cache concurrently inside the join job — the
    // r14 sweep's occasional 3× sample outlier. The count() realizes the
    // index as its own short job first, so the self-join always scans a
    // warm, fully-built cache; the index is slim by construction
    // ((doc_id, 8-byte hash, n) for prefix tokens only — the artifact a
    // production deployment would write to a table anyway), so the
    // materialization barrier costs one bounded pass, not a replan.
    // (An eager localCheckpoint was measured here too: 3.5× slower at
    // sf0.1 — checkpoint serialization dwarfs the subtree it saves.)
    val pref = sh.join(df, "s")
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("n") - expr(s"($TauNum * n + ${TauDen - 1}) div $TauDen") + 1)
      .select(col("doc_id"), xxhash64(col("s")).as("h"), col("n"))
      .persist()
    pref.count() // materialization barrier — see the comment above
    val cands = pref.as("a")
      .join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * TauNum <=
            least(col("a.n"), col("b.n")) * TauDen)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cands
      .join(arr.select(col("doc_id").as("a_id"), col("arr").as("a_arr")), "a_id")
      .join(arr.select(col("doc_id").as("b_id"), col("arr").as("b_arr")), "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_arr"), col("b_arr"))).cast("long").as("inter"),
        (size(col("a_arr")) + size(col("b_arr")) -
          size(array_intersect(col("a_arr"), col("b_arr")))).cast("long").as("un"))
      .filter(col("inter") * TauDen >= col("un") * TauNum)
      .withColumn("jac", col("inter").cast("double") / col("un"))
      .orderBy("a_id", "b_id")
  }

  /** Split-leakage audit — test-set contamination through NEAR-duplicates.
    *
    * Exact dedup inside one split never catches the train/test leak that
    * matters for eval integrity: a test document whose near-twin sits in
    * train. This audit derives every exact-Jaccard ≥ τ pair
    * ([[prefixJaccardPairsOf]] — lossless, so "0 leaked" is a guarantee,
    * not an estimate) and buckets it by the engine's own deterministic
    * split rule ([[Sampling.splitOf]], the SAME assignment `split_counts`
    * releases). Cross-split rows are the leak; same-split rows the intra-
    * split dedup backlog.
    *
    * Scale shape: the split is a pure md5 function of each pair's ids —
    * derived IN the pair row, zero joins beyond the set-sim join itself;
    * the final agg is a ≤3-row groupBy. At 100 TB the cost is exactly the
    * cost of the exact near-dup pass, which the prefix filter already
    * bounds.
    */
  def splitLeakageAudit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = prefixJaccardPairsOf(Tables(spark, dir, "documents"))
    val (sa, sb) = (Sampling.splitOf(col("a_id")), Sampling.splitOf(col("b_id")))
    pairs
      .select(least(sa, sb).as("split_a"), greatest(sa, sb).as("split_b"),
        col("jac"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("pairs"), max(col("jac")).as("max_jac"))
      .orderBy("split_a", "split_b")
  }

  /** Oracle: the BRUTE all-pairs formulation — every pair's exact
    * intersection via the shingle self-join, thresholded the same
    * integer way. Independent of the prefix filter; equality IS the
    * losslessness claim.
    */
  val prefixJaccardPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(t) >= 3
       |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
       |      ELSE [lower(text)] END) AS sh
       |  FROM toks JOIN documents USING (doc_id)
       |), ex AS (
       |  SELECT doc_id, unnest(sh) AS s FROM sh
       |), sz AS (
       |  SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
       |), pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT a_id, b_id, i AS inter, un, i::DOUBLE / un AS jac FROM (
       |  SELECT p.a_id, p.b_id, p.i, na.n + nb.n - p.i AS un
       |  FROM pairs p
       |  JOIN sz na ON na.doc_id = p.a_id
       |  JOIN sz nb ON nb.doc_id = p.b_id)
       |WHERE i * $TauDen >= un * $TauNum
       |ORDER BY a_id, b_id""".stripMargin

  /** Oracle: brute all-pairs Jaccard (independent of the prefix filter)
    * bucketed by the same md5-nibble split rule as `split_counts`.
    */
  val splitLeakageAuditSql: String = {
    val core = prefixJaccardPairsSql
      .replaceAll("(?s)SELECT a_id, b_id, i AS inter.*$", "")
    core +
      s""", qual AS (
         |  SELECT p.a_id, p.b_id, p.i::DOUBLE / (na.n + nb.n - p.i) AS jac
         |  FROM pairs p
         |  JOIN sz na ON na.doc_id = p.a_id
         |  JOIN sz nb ON nb.doc_id = p.b_id
         |  WHERE p.i * $TauDen >= (na.n + nb.n - p.i) * $TauNum
         |), lab AS (
         |  SELECT CASE WHEN substr(md5(a_id::VARCHAR), 1, 1) BETWEEN 'c' AND 'f'
         |              THEN 'test' ELSE 'train' END AS la,
         |         CASE WHEN substr(md5(b_id::VARCHAR), 1, 1) BETWEEN 'c' AND 'f'
         |              THEN 'test' ELSE 'train' END AS lb,
         |         jac
         |  FROM qual
         |)
         |SELECT least(la, lb) AS split_a, greatest(la, lb) AS split_b,
         |       count(*) AS pairs, max(jac) AS max_jac
         |FROM lab
         |GROUP BY 1, 2
         |ORDER BY split_a, split_b""".stripMargin
  }
}
