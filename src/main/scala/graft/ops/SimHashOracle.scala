package graft.ops

/** DuckDB oracle SQL for [[Dedup.simhash]] / [[Dedup.simhashNearDup]]:
  * xxHash64 (seed 42, Spark's builtin `xxhash64` over UTF-8 bytes)
  * re-derived position-by-position in HUGEINT mod-2⁶⁴ arithmetic — the same
  * discipline that converted the winnow fingerprints
  * ([[TextAnalysis.winnowFingerprintsSql]]).
  *
  * Every value flows through the pipeline as an unsigned residue in
  * [0, 2⁶⁴) held in HUGEINT:
  *
  *  - 64×64→64 multiply: schoolbook split at 2³² — `lo·lo + ((hi·lo +
  *    lo·hi) mod 2³²)·2³²`, all intermediates < 2⁶⁵ so nothing overflows
  *    HUGEINT's 2¹²⁷ (a direct 64×64 product would).
  *  - rotl(x, r) = (x mod 2⁶⁴⁻ʳ)·2ʳ + x ÷ 2⁶⁴⁻ʳ (division on a
  *    non-negative residue IS logical shift right).
  *  - xor routes through UBIGINT (well-defined 64-bit bitwise) and back.
  *
  * The hash itself unrolls xxHash64's data-dependent loops as guarded CTE
  * layers: up to three full 8-byte little-endian words (matching x86
  * `getLong`), one optional 4-byte word, up to three tail bytes, then the
  * fixed avalanche. Valid for tokens up to 31 BYTES (no ≥32 stripe loop —
  * the corpus vocabulary maxes at 8) and single-byte UTF-8 only (`ord` =
  * codepoint = the byte for ASCII; the corpus is ASCII — same caveat as
  * the winnow oracle). Verified value-exact against Spark's `xxhash64`
  * for every corpus token AND a synthetic sweep of all lengths 1–31.
  *
  * On top of the per-token hash, the SimHash vote: each DISTINCT token is
  * hashed once and rejoined with its per-document multiplicity (the
  * fingerprint weights every occurrence), bit i's vote is
  * Σ cnt·(2·bit−1), and fingerprint bit i is set iff the vote is strictly
  * positive — the exact [[graft.functions.SimHash64]] semantics.
  */
object SimHashOracle {

  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val M64 = BigInt(2).pow(64)
  private val M32 = BigInt(2).pow(32)

  private def mm(a: String, b: String): String =
    s"((($a) % $M32) * (($b) % $M32) + (((($a) // $M32) * (($b) % $M32) + " +
      s"(($a) % $M32) * (($b) // $M32)) % $M32) * $M32) % $M64"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(2).pow(64 - r)
    s"((($x) % $lo) * ${BigInt(2).pow(r)} + ($x) // $lo)"
  }

  private def xr(a: String, b: String): String =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"

  private def byteAt(pos: String): String =
    s"ord(substr(token, ($pos)::BIGINT, 1))::HUGEINT"

  /** Little-endian word value of `n` bytes at 1-based offset `off`. */
  private def word(off: String, n: Int): String =
    (0 until n).map(j => s"${byteAt(s"$off + $j")} * ${BigInt(256).pow(j)}")
      .mkString(" + ")

  /** CTE layers `v0 … vh` computing vh(token, h BIGINT, hu HUGEINT) from
    * vocab(token).
    */
  private val hashLayers: String = {
    val chunkSteps = (1 to 3).map { i =>
      val off = 8 * (i - 1) + 1
      val prev = if (i == 1) "v0" else s"c${i - 1}d"
      s"""c${i}a AS (SELECT token, len, h, CASE WHEN len >= ${8 * i} THEN ${word(off.toString, 8)} ELSE NULL END AS c FROM $prev),
         |c${i}b AS (SELECT token, len, h, ${rotl(mm("c", P2.toString), 31)} AS rc FROM c${i}a),
         |c${i}c AS (SELECT token, len, h, ${xr("h", mm("rc", P1.toString))} AS hx FROM c${i}b),
         |c${i}d AS (SELECT token, len, coalesce((${mm(rotl("hx", 27), P1.toString)} + $P4) % $M64, h) AS h FROM c${i}c)""".stripMargin
    }
    val byteSteps = (0 to 2).map { j =>
      val prev = if (j == 0) "f2" else s"b${j - 1}c"
      s"""b${j}a AS (SELECT token, len, h, CASE WHEN len % 4 > $j THEN ${byteAt(s"len - len % 4 + $j + 1")} ELSE NULL END AS c FROM $prev),
         |b${j}b AS (SELECT token, len, h, ${xr("h", mm("c", P5.toString))} AS hx FROM b${j}a),
         |b${j}c AS (SELECT token, len, coalesce(${mm(rotl("hx", 11), P1.toString)}, h) AS h FROM b${j}b)""".stripMargin
    }
    (Seq(
      s"v0 AS (SELECT token, length(token)::HUGEINT AS len, (42 + $P5 + length(token)) % $M64 AS h FROM vocab)") ++
      chunkSteps ++
      Seq(
        s"""f0 AS (SELECT token, len, h, CASE WHEN len % 8 >= 4 THEN ${word("(len // 8) * 8 + 1", 4)} ELSE NULL END AS c FROM c3d),
           |f1 AS (SELECT token, len, h, ${xr("h", mm("c", P1.toString))} AS hx FROM f0),
           |f2 AS (SELECT token, len, coalesce((${mm(rotl("hx", 23), P2.toString)} + $P3) % $M64, h) AS h FROM f1)""".stripMargin) ++
      byteSteps ++
      Seq(
        s"""av1 AS (SELECT token, ${mm(xr("h", s"h // ${BigInt(2).pow(33)}"), P2.toString)} AS h FROM b2c),
           |av2 AS (SELECT token, ${mm(xr("h", s"h // ${BigInt(2).pow(29)}"), P3.toString)} AS h FROM av1),
           |vh AS (SELECT token, ((CASE WHEN hu >= ${BigInt(2).pow(63)} THEN hu - $M64 ELSE hu END))::BIGINT AS h, hu FROM (SELECT token, ${xr("h", s"h // ${BigInt(2).pow(32)}")} AS hu FROM av2))""".stripMargin))
      .mkString(",\n")
  }

  private val bitsRows: String =
    (0 until 64).map(i => s"($i, ${BigInt(2).pow(i)}::HUGEINT)").mkString(", ")

  /** Shared WITH-chain ending in fp(doc_id, hu HUGEINT, simhash BIGINT). */
  private val core: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
       |  FROM documents
       |), vocab AS (SELECT DISTINCT token FROM toks),
       |$hashLayers,
       |counts AS (SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |bits(bit, pw) AS (VALUES $bitsRows),
       |votes AS (
       |  SELECT c.doc_id, b.bit, b.pw,
       |    sum(c.cnt * (2 * ((vh.hu // b.pw) % 2) - 1)) AS v
       |  FROM counts c JOIN vh USING (token) CROSS JOIN bits b
       |  GROUP BY 1, 2, 3
       |), fp AS (
       |  SELECT doc_id, hu,
       |    ((CASE WHEN hu >= ${BigInt(2).pow(63)} THEN hu - $M64 ELSE hu END))::BIGINT AS simhash
       |  FROM (SELECT doc_id, coalesce(sum(CASE WHEN v > 0 THEN pw ELSE 0 END), 0)::HUGEINT AS hu
       |        FROM votes GROUP BY doc_id)
       |)""".stripMargin

  val simhashSql: String =
    core + "\nSELECT doc_id, simhash FROM fp ORDER BY doc_id"

  /** Blocking + verify mirror of [[Dedup.simhashNearDup]]: the four 16-bit
    * segments are pure arithmetic on the unsigned fingerprint (integer
    * powers via a VALUES table — `**` is a double in DuckDB and corrupts
    * the division above 2⁵³), candidates join per segment, and Hamming
    * distance is `bit_count(xor(...))` on the signed value (two's
    * complement — bit-identical to Spark's).
    */
  val simhashNearDupSql: String =
    core +
      s""",
         |segpw(seg, pw) AS (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
         |  (2, 4294967296::HUGEINT), (3, 281474976710656::HUGEINT)),
         |segs AS (
         |  SELECT doc_id, simhash, seg, (hu // pw) % 65536 AS seg_val
         |  FROM fp CROSS JOIN segpw
         |)
         |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM segs a JOIN segs b ON a.seg = b.seg AND a.seg_val = b.seg_val
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin
}
