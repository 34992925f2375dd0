package graft.operators

/** Text-pipeline expression builders: dedup fingerprints, MinHash, SimHash,
  * n-gram shingles, token counts.
  *
  * Every operator here is a **pure per-row expression** (higher-order
  * array functions, no explode, no UDF): it runs inside whole-stage
  * codegen, shuffles nothing, and scales linearly — the right shape for a
  * 100 TB document corpus. Each builder emits the Spark SQL form and the
  * DuckDB oracle form from the same code path so the two can't drift.
  *
  * The shared primitive is a 60-bit hash derived from md5 — the one hash
  * both engines compute identically (murmur/xxhash implementations
  * differ). 15 hex chars = 60 bits < 63, so the BIGINT cast never
  * overflows.
  */
object TextOps {

  /** 60-bit deterministic hash of a string expression, both dialects. */
  def hash60Spark(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"
  def hash60Duck(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  def wordsSpark(text: String): String = s"split($text, ' ')"
  def wordsDuck(text: String): String = s"string_split($text, ' ')"

  /** MinHash signature component i over word-3-gram shingles: min over
    * shingles of hash60(i ':' shingle). k components → k calls. Per-row
    * array fold — no explode/groupBy needed. 3-gram shingles (not single
    * words): corpora share vocabularies, so 1-gram signatures collide on
    * the globally-min-hashed common word and LSH degenerates to a near-
    * cross-join; 3-gram space is |V|³ and keeps bands selective.
    */
  /** Hash every shingle once to its 60-bit id. The k MinHash functions
    * are then derived by XOR-mixing with fixed 60-bit constants — one
    * md5 per shingle total instead of k, which is the difference between
    * O(docs·shingles) and O(docs·shingles·k) hashing at corpus scale.
    */
  def shingleHashesSpark(shingles: String): String =
    s"transform($shingles, w -> ${hash60Spark("w")})"
  def shingleHashesDuck(shingles: String): String =
    s"list_transform($shingles, w -> ${hash60Duck("w")})"

  /** XOR-mixing constant for hash function i (splitmix64 golden-ratio
    * multiplier, masked to 60 bits so results stay positive).
    */
  def xorConst(i: Int): Long = (i.toLong * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1)

  private val mask60 = (1L << 60) - 1

  /** 60-bit hashes of word n-gram shingles computed WITHOUT building
    * n-gram strings: hash each word once (one md5 per word — pass a
    * MATERIALIZED word-hash array column from wordHashes*), then combine
    * adjacent word hashes with shift+xor. Cuts hashing cost n× versus
    * hashing shingle strings and skips string allocation — the per-row
    * cost that dominates corpus-scale near-dup jobs. Documents shorter
    * than n words fall back to their word-hash set.
    */
  def ngramHashesSpark(n: Int, wh: String): String = {
    require(n == 3, "combiner below is written for n=3")
    s"""array_distinct(CASE WHEN size($wh) >= $n THEN
       |  transform(sequence(0, size($wh) - $n), i ->
       |    (shiftleft(element_at($wh, i + 1), 2) ^ shiftleft(element_at($wh, i + 2), 1)
       |     ^ element_at($wh, i + 3)) & ${mask60}L)
       |ELSE $wh END)""".stripMargin
  }
  def ngramHashesDuck(n: Int, wh: String): String = {
    require(n == 3, "combiner below is written for n=3")
    s"""list_distinct(CASE WHEN len($wh) >= $n THEN
       |  list_transform(range(1, len($wh) - ${n - 2}), i ->
       |    xor(xor($wh[i] << 2, $wh[i + 1] << 1), $wh[i + 2]) & $mask60)
       |ELSE $wh END)""".stripMargin
  }

  def minhashSpark(i: Int, hashes: String): String =
    s"array_min(transform($hashes, h -> h ^ cast(${xorConst(i)} as bigint)))"
  def minhashDuck(i: Int, hashes: String): String =
    s"list_aggregate(list_transform($hashes, h -> xor(h, (${xorConst(i)})::BIGINT)), 'min')"

  /** LSH band key over a precomputed shingle-HASH array column
    * (shingleHashes*): md5 of the concatenated signature slice.
    * bands×rowsPerBand signature components; band b covers components
    * [b*rows, (b+1)*rows). Pass a materialized hash column so shingles
    * are hashed once per row, not once per hash function.
    */
  def bandSpark(b: Int, rowsPerBand: Int, hashes: String): String = {
    val parts = (b * rowsPerBand until (b + 1) * rowsPerBand)
      .map(i => s"cast(${minhashSpark(i, hashes)} as string)").mkString(", '_', ")
    s"md5(concat($parts))"
  }
  def bandDuck(b: Int, rowsPerBand: Int, hashes: String): String = {
    val parts = (b * rowsPerBand until (b + 1) * rowsPerBand)
      .map(i => s"${minhashDuck(i, hashes)}::VARCHAR").mkString(" || '_' || ")
    s"md5($parts)"
  }

  /** Word n-gram shingle array (distinct), for Jaccard similarity. */
  def ngramsSpark(n: Int, text: String = "text"): String = {
    val w = wordsSpark(text)
    s"""array_distinct(
       |  CASE WHEN size($w) >= $n
       |  THEN transform(sequence(0, size($w) - $n), i -> concat_ws(' ', slice($w, i + 1, $n)))
       |  ELSE array($text) END)""".stripMargin
  }
  def ngramsDuck(n: Int, text: String = "text"): String = {
    val w = wordsDuck(text)
    s"""list_distinct(
       |  CASE WHEN len($w) >= $n
       |  THEN list_transform(range(1, len($w) - ${n - 2}), i -> array_to_string($w[i:i+${n - 1}], ' '))
       |  ELSE [$text] END)""".stripMargin
  }

  /** Jaccard similarity of two (distinct-element) array columns. */
  def jaccardSpark(a: String, b: String): String =
    s"cast(size(array_intersect($a, $b)) as double) / size(array_distinct(concat($a, $b)))"
  def jaccardDuck(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / len(list_distinct(list_concat($a, $b)))"

  /** SimHash over a precomputed word-hash array column `hs`
    * (array<bigint>): for each of `bits` bit positions, sum +1/-1 votes
    * across word hashes; bit j of the result is 1 iff the vote is
    * positive.
    */
  def simhashSpark(hs: String, bits: Int): String = {
    val terms = (0 until bits).map { j =>
      s"""shiftleft(CASE WHEN aggregate($hs, 0,
         | (acc, h) -> acc + (CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         | THEN cast(1 as bigint) ELSE cast(0 as bigint) END, $j)""".stripMargin
    }
    terms.mkString("(", " + ", ")")
  }
  def simhashDuck(hs: String, bits: Int): String = {
    val terms = (0 until bits).map { j =>
      s"""(CASE WHEN list_sum(list_transform($hs,
         | h -> CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         | THEN 1::BIGINT ELSE 0::BIGINT END << $j)""".stripMargin
    }
    terms.mkString("(", " + ", ")")
  }

  /** Word-hash array (the `hs` input for simhash). */
  def wordHashesSpark(text: String = "text"): String =
    s"transform(${wordsSpark(text)}, w -> ${hash60Spark("w")})"
  def wordHashesDuck(text: String = "text"): String =
    s"list_transform(${wordsDuck(text)}, w -> ${hash60Duck("w")})"

  /** Content fingerprint: md5 over the sorted distinct word set —
    * order-insensitive document identity for near-dup blocking.
    */
  def fingerprintSpark(text: String = "text"): String =
    s"md5(concat_ws(' ', array_sort(array_distinct(${wordsSpark(text)}))))"
  def fingerprintDuck(text: String = "text"): String =
    s"md5(array_to_string(list_sort(list_distinct(${wordsDuck(text)})), ' '))"

  /** DuckDB CTE chain replaying Dedup.minhashBands →
    * minhashCandidatePairs — and, with `withWalk`, the connected-
    * components label walk — over source relation `src` (must expose
    * doc_id + text). The q71/q99/q109/q114 oracles all build on this
    * ONE rendering, so a change to the Spark-side defaults (bands,
    * rowsPerBand, maxBucket, the band hash) cannot silently desync a
    * hand-copied SQL twin; defaults here mirror Dedup's defaults.
    *
    * Emits CTEs: wh, hashed, sig, stacked, ok, kept, pairs(a, b),
    * edges(src, dst), and with withWalk also walk(node, lbl) +
    * comp(node, cluster_id). The walk is recursive — call sites using
    * it must open with WITH RECURSIVE.
    */
  def lshPairsCtesDuck(
      src: String, bands: Int = 4, rowsPerBand: Int = 2,
      maxBucket: Int = 32, withWalk: Boolean = true): String = {
    val base = s"""wh AS (SELECT doc_id, ${wordHashesDuck()} AS wh FROM $src),
        hashed AS (SELECT doc_id, ${ngramHashesDuck(3, "wh")} AS hh FROM wh),
        sig AS (
          SELECT doc_id,
                 ${(0 until bands).map(b => s"${bandDuck(b, rowsPerBand, "hh")} AS band$b")
        .mkString(",\n                 ")}
          FROM hashed),
        stacked AS (
          ${(0 until bands).map(b => s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig")
        .mkString("\n          UNION ALL ")}),
        ok AS (SELECT band_idx, band_key FROM stacked
               GROUP BY 1, 2 HAVING count(*) <= $maxBucket),
        kept AS (SELECT s.* FROM stacked s JOIN ok USING (band_idx, band_key)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM kept a JOIN kept b
            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id),
        edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b AS src, a AS dst FROM pairs)"""
    if (!withWalk) base
    else base + s""",
        walk(node, lbl) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node),
        comp AS (SELECT node, min(lbl) AS cluster_id FROM walk GROUP BY node)"""
  }
}
