package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, fingerprinting, shingles,
  * MinHash and SimHash signatures. All pure Catalyst expression trees
  * (higher-order functions over arrays, xxhash64, md5) — codegen'd,
  * shuffle-free per row, so they run at scan speed over 100 TB of text.
  */
object TextFunctions {

  /** Whitespace tokenization, lowercased. Single-space split keeps parity
    * with the DuckDB oracle's `string_split(text, ' ')`. */
  def tokens(c: Column): Column = split(lower(c), " ")

  /** BPE-ish subword token-count estimate: words + punctuation clusters
    * counted separately (a cheap stand-in for a real tokenizer's count). */
  def tokenCountEstimate(c: Column): Column =
    size(filter(split(c, "[\\s]+"), t => length(t) > 0)) +
      size(filter(split(c, "[^\\p{Punct}]+"), t => length(t) > 0))

  // --- quality scoring -----------------------------------------------------

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "is", "are", "to", "in", "on", "for", "with")

  /** All ratio denominators are wrapped in `nullif(·, 0)`: Spark 4 runs with
    * ANSI SQL on by default, so a bare `x / 0` would throw DIVIDE_BY_ZERO at
    * runtime; with the guard an empty token array yields SQL NULL — the same
    * thing `x / NULLIF(d, 0)` yields in the DuckDB oracle. */
  private def safeDiv(num: Column, den: Column): Column =
    num.cast("double") / nullif(den.cast("double"), lit(0.0))

  def stopwordRatio(toks: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    safeDiv(size(filter(toks, t => array_contains(sw, t))), size(toks))
  }

  def distinctTokenRatio(toks: Column): Column =
    safeDiv(size(array_distinct(toks)), size(toks))

  def meanTokenLength(toks: Column): Column =
    safeDiv(aggregate(toks, lit(0.0), (acc, t) => acc + length(t)), size(toks))

  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "\\p{Punct}", ""))).cast("double") /
      greatest(length(c), lit(1))

  // --- language ID (n-gram/stopword heuristic) -----------------------------

  /** tiny per-language marker dictionaries; hit-count scoring. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "est", "les"))

  def langHits(toks: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(markers.map(lit): _*)))

  /** argmax over LangMarkers hit counts; ties resolved by dictionary order
    * above (foldRight ⇒ the first language's `when` is outermost); zero
    * hits everywhere → "und" (undetermined). */
  def langIdPredict(toks: Column): Column = {
    val hits = LangMarkers.map { case (l, m) => l -> langHits(toks, m) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((l, h), els) =>
      when(h === best && best > 0, lit(l)).otherwise(els)
    }
  }

  // --- fingerprinting -------------------------------------------------------

  /** Content fingerprint: md5 over the sorted distinct token set — detects
    * bag-of-words-equal documents regardless of order/multiplicity. */
  def contentFingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Exact-text fingerprint. */
  def exactFingerprint(c: Column): Column = md5(c)

  /** 64-bit rolling document fingerprint (xxhash64 of full text). */
  def hashFingerprint(c: Column): Column = xxhash64(c)

  // --- shingles / MinHash / SimHash ----------------------------------------

  /** Word n-gram shingles: ["a","b","c","d"], n=3 → ["a b c","b c d"]. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Deterministic per-seed hash of a token: xxhash64(token, seed). */
  private def tokenHash(t: Column, seed: Int): Column = xxhash64(t, lit(seed))

  /** MinHash signature: k independent permutations approximated by seeded
    * xxhash64; signature[i] = min over shingles of h_i(s).
    * Jaccard(A,B) ≈ fraction of agreeing signature slots. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => aggregate(shingleCol, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, i))))

  /** LSH band keys: hash `rows`-sized runs of the signature; docs sharing
    * any band key are near-dup candidates (classic MinHash-LSH banding). */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws("_", b.cast("string"),
        xxhash64(concat_ws(",", transform(slice(sig, b * rows + 1, lit(rows)), _.cast("string"))))
          .cast("string")))

  /** Numeric band keys for a BIT-PACKED 64-bit signature (SimHash /
    * hyperplane LSH): band i = `(i << width) | bits[i*width, (i+1)*width)`
    * — 8 bytes through the band exchange, no per-row string building.
    * The single definition all three banded paths (SimHash pairs,
    * embedding LSH pairs, SRP-LSH kNN) share, so their keyspaces cannot
    * drift apart. `bands * width` must be ≤ 64 and `width` ≤ 32. */
  def packedBandKeys(sig: Column, bands: Int, width: Int): Seq[Column] = {
    require(bands > 0 && width > 0 && width <= 32 && bands * width <= 64,
      s"invalid banding: bands=$bands width=$width")
    val mask = (1L << width) - 1L
    (0 until bands).map(i =>
      shiftright(sig, i * width).bitwiseAND(lit(mask))
        + lit(i.toLong * (mask + 1L)))
  }

  /** 64-bit SimHash over tokens: bit j of result = sign of
    * Σ_tokens (bit j of xxhash64(token) ? +1 : -1). Formulated bit-major
    * (outer loop over the 64 bit positions, inner filter over tokens):
    * "more tokens set bit j than clear it" ⇔ 2·|{t: bit_j(h(t))=1}| > |toks|. */
  def simhash64(toks: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(63)), j =>
        // shiftright/shiftleft's Scala API takes a literal Int shift; with a
        // per-bit Column shift we go through the SQL registry instead.
        when(size(filter(toks, t =>
          call_function("shiftright", xxhash64(t), j.cast("int"))
            .bitwiseAND(lit(1L)) === lit(1L))) * 2
          > size(toks),
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // --- set similarity -------------------------------------------------------

  /** Jaccard similarity of two token/shingle arrays (distinct-set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a); val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    safeDiv(inter, size(ad) + size(bd) - inter)
  }
}
