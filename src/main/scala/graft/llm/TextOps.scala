package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operators for the LLM-data-pipeline surface: tokenize,
  * shingle, fingerprint, SimHash, quality scoring, language-ID heuristics.
  *
  * Everything here is built from codegen'd Catalyst built-ins (split /
  * higher-order array functions / md5 / xxhash64) — no UDFs, so the hot path
  * stays inside whole-stage codegen and the expressions are pushdown- and
  * null-safe at any scale. Where an operator must be replicated bit-for-bit
  * by the DuckDB oracle (fingerprint, SimHash), the hash primitive is `md5`,
  * which both engines implement identically over the same bytes; xxhash64 is
  * used only where the oracle compares final *outputs*, not hashes (MinHash
  * signatures — candidates are an internal detail, the verified Jaccard
  * output is engine-independent).
  */
object TextOps {

  /** Whitespace tokenization (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingle set, the unit of near-dup Jaccard.
    * 1-based `slice`, same indexing as the DuckDB oracle's list slice.
    * Docs shorter than n tokens get an empty set (guarded explicitly:
    * Spark's `sequence(1, 0)` counts *down*, it is not empty). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Exact content fingerprint — md5 hex, identical in Spark and DuckDB. */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Count-weighted 32-bit SimHash over tokens, derived from the high bit of
    * each of the 32 md5 hex digits of the token. Classic Charikar simhash:
    * bit_j(doc) = sign( Σ_tok count(tok) * (±1 by bit_j(md5(tok))) ).
    *
    * Computed from a (doc_id, token, count, md5) relation by the
    * [[graft.functions.SimHashAgg]] sketch aggregate — one shuffle on
    * doc_id with map-side partial aggregation, no collect, no UDF. Both
    * engines compute the identical integer (the oracle runs the same
    * arithmetic as 32 conditional SUMs), so the comparison is exact.
    */
  val SimhashBits = 32

  /** Tiny English stopword profile used by the quality and lang-id
    * heuristics (the synthetic corpus is lowercase a-z). */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Heuristic quality score in [0,1]: a weighted blend of length,
    * lexical diversity, and stopword rate — the standard cheap pre-filter a
    * training-data pipeline runs before expensive dedup/decode stages.
    * Pure integer/double arithmetic → identical in the oracle. */
  def qualityScore(toks: Column, nChars: Column): Column = {
    val nTok     = size(toks)
    val nDistinct = size(array_distinct(toks))
    val stopHits = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*)))
    // each component clamped to [0,1]; round(…*1e6)/1e6 pins FP identically
    val lenScore  = least(nTok.cast("double") / 64.0, lit(1.0))
    val divScore  = nDistinct.cast("double") / greatest(nTok, lit(1)).cast("double")
    val stopScore = least(lit(10.0) * stopHits / greatest(nTok, lit(1)), lit(1.0))
    round((lenScore * 0.4 + divScore * 0.4 + stopScore * 0.2) * 1e6) / 1e6
  }

  /** SQL twin of [[qualityScore]] for the DuckDB oracle. */
  def qualityScoreSql(toksExpr: String, nTokExpr: String): String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""round((
       |  least(CAST($nTokExpr AS DOUBLE) / 64.0, 1.0) * 0.4 +
       |  CAST(len(list_distinct($toksExpr)) AS DOUBLE) / greatest($nTokExpr, 1) * 0.4 +
       |  least(10.0 * len(list_filter($toksExpr, t -> t IN ($stopList))) / greatest($nTokExpr, 1), 1.0) * 0.2
       |) * 1e6) / 1e6""".stripMargin
  }

  /** Stopword-profile language-ID heuristic: claim 'en' when the English
    * stopword rate clears 2%, else 'und' (undetermined). A real pipeline
    * swaps in per-language n-gram profiles; the operator shape — a scored
    * argmax over profile hit-rates, groupable against labeled data — is what
    * matters and is identical at any profile size. */
  def langGuess(toks: Column): Column = {
    val nTok     = greatest(size(toks), lit(1))
    val stopHits = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*)))
    when(stopHits.cast("double") / nTok >= 0.02, lit("en")).otherwise(lit("und"))
  }

  def langGuessSql(toksExpr: String): String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN CAST(len(list_filter($toksExpr, t -> t IN ($stopList))) AS DOUBLE)
       |          / greatest(len($toksExpr), 1) >= 0.02
       |     THEN 'en' ELSE 'und' END""".stripMargin
  }

  /** Polynomial rolling-hash document fingerprint over the token stream:
    * fp = fold(0, (acc, t) → (acc·131 + code(t)) mod p) with
    * code(t) = len(t)·1000 + ascii(t₀) and p = 2³¹−1. Order-sensitive
    * (unlike the md5 content hash, a permuted document fingerprints
    * differently ⇒ usable for shingle-free near-identity), bounded to 2³⁸
    * intermediates so ANSI-mode long arithmetic never overflows, and a
    * left fold in both engines so values are bit-identical. */
  val RollB = 131L
  val RollP: Long = (1L << 31) - 1

  def rollingFingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => length(t).cast("long") * 1000L + ascii(t).cast("long")),
      lit(0L),
      (acc, c) => (acc * RollB + c) % RollP)

  /** DuckDB twin: list_reduce folds with the first element as the seed, so
    * the 0 seed is prepended. */
  def rollingFingerprintSql(toksExpr: String): String =
    s"""list_reduce([CAST(0 AS BIGINT)] ||
       |  list_transform($toksExpr, t -> CAST(len(t) AS BIGINT) * 1000 + ascii(t)),
       |  (acc, c) -> (acc * $RollB + c) % $RollP)""".stripMargin

  /** BPE-ish subword count: whitespace tokens plus an extra unit per 4 chars
    * beyond the first 4 — the cheap deterministic stand-in for a real BPE
    * vocab (len/4 is the classic "~4 chars per token" heuristic). */
  def subwordCount(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + greatest(ceil(length(t) / 4.0), lit(1L)))

  def subwordCountSql(toksExpr: String): String =
    s"CAST(list_sum(list_transform($toksExpr, t -> greatest(CAST(ceil(len(t) / 4.0) AS BIGINT), 1))) AS BIGINT)"
}
