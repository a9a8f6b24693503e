package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native one-pass MinHash / SimHash kernels.
  *
  * The HOF formulations in [[TextFunctions]] are correct but make k (=64)
  * interpreted passes over the token array — `minhashSignature` evaluates
  * one `aggregate` lambda chain per permutation, and `simhash64` re-hashes
  * every token once per bit position (64× redundant string hashing). These
  * expressions hash each token ONCE and derive all k slots / all 64 bit
  * counts from that single digest in a primitive loop — the shape that
  * matters when signing billions of documents (the LSH dedup pass over a
  * 100 TB corpus is exactly such a scan).
  *
  * Bit-compatible with the HOF versions (verified by parity tests):
  *  - slot i of the signature = min over tokens of `xxhash64(tok, i)`,
  *    reproduced here as `XXH64.hashInt(i, XXH64.hashUTF8String(tok, 42))`
  *    — the same seed-chaining Spark's `xxhash64(c1, c2)` performs;
  *  - SimHash bit j = strict majority of `bit_j(xxhash64(tok))` over
  *    tokens (ties → 0), identical to the HOF's `2·|set| > n` rule.
  *
  * `CodegenFallback` is deliberate: the per-row cost is the O(tokens·k)
  * loop inside eval, so breaking the whole-stage-codegen span costs
  * nothing measurable, and array-returning codegen would add complexity
  * for no win. Null array → null; null *elements* are skipped.
  */
trait TokenArrayExpression extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
}

/** MinHash signature: k seed-chained xxhash64 permutations, one string
  * hash per token. Empty input → all-Long.MaxValue (as the HOF's
  * `aggregate` init value yields). */
case class MinHashSigExpr(child: Expression, k: Int) extends TokenArrayExpression {
  require(k > 0, "minhash signature length must be positive")
  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h1 = XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
        var i = 0
        while (i < k) {
          val hi = XXH64.hashInt(i, h1)
          if (hi < sig(i)) sig(i) = hi
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over PRE-HASHED set elements (array<bigint>, e.g.
  * the output of [[ShingleHashSetExpr]]): slot i = min over elements of
  * `XXH64.hashInt(i, elemHash)` — the same seed-chaining as
  * [[MinHashSigExpr]] with the string hash replaced by the element's
  * 64-bit digest. Lets the signature estimate the jaccard of ANY hashed
  * set (word n-gram shingles, feature ids) rather than only word
  * 1-grams — signing the same set a downstream exact-verify stage
  * measures is what makes est-jaccard a faithful candidate filter.
  * Empty input → all-Long.MaxValue; null elements impossible
  * (containsNull=false upstream) but skipped defensively. */
case class MinHashSigFromHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, "minhash signature length must be positive")
  override def prettyName: String = "graft_minhash_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h1 = arr.getLong(t)
        var i = 0
        while (i < k) {
          val hi = XXH64.hashInt(i, h1)
          if (hi < sig(i)) sig(i) = hi
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band keys as 64-bit hashes: band b of a k-slot signature is the
  * seed-chained xxhash64 of its `rows` slots, mixed with the band index
  * → array<long> of length `bands`. The numeric replacement for the
  * string keys `"b_" + hash` the HOF spelling builds: the band join is
  * the dominant shuffle of every LSH pass, and an 8-byte key both
  * shuffles and hash-compares several times cheaper than a concat'd
  * string (which also cost per-row string building). A 64-bit collision
  * can only MERGE two buckets — extra candidates that the downstream
  * est/hamming/exact-verify filters reject — never lose a pair. */
case class LshBandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands > 0 && rows > 0, "bands and rows must be positive")
  override def prettyName: String = "graft_lsh_band_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[ArrayData]
    // fail LOUDLY on a bands/rows/k mismatch: a short signature would
    // otherwise hash empty slot ranges into one CONSTANT key per tail
    // band, silently putting every document in a single bucket and
    // sending the band self-join quadratic over the whole corpus
    require(sig.numElements() >= bands * rows,
      s"$prettyName: signature has ${sig.numElements()} slots, " +
        s"bands*rows = ${bands * rows} required")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var j = b * rows
      val end = (b + 1) * rows
      while (j < end) { acc = XXH64.hashLong(sig.getLong(j), acc); j += 1 }
      out(b) = XXH64.hashInt(b, acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash: one xxhash64 per token, ±1 per bit position, sign of
  * the per-bit sum. */
case class SimHash64Expr(child: Expression) extends TokenArrayExpression {
  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word-n-gram shingle HASHES in one pass: each token is
  * xxhash64'd once, each shingle hash is the seed-chain of its n token
  * hashes, and deduplication runs over primitive longs in an
  * open-addressing table — no shingle strings are ever materialized.
  *
  * The HOF spelling (`transform` + `slice` + `concat_ws`, then
  * `array_distinct`) builds every shingle string through interpreted
  * lambdas at ~µs/shingle; for the inverted-index Jaccard join the
  * shingle's identity is only ever used as a join key, so a 64-bit hash
  * is a drop-in replacement (collision odds ~2⁻⁶⁴ per pair of distinct
  * shingles — distinct counts and intersection counts are unchanged
  * w.h.p., which the DuckDB string-based oracle confirms at sf0.01).
  * Fewer than n tokens → one shingle spanning all tokens (matching
  * [[TextFunctions.shingles]]). Null elements are skipped. */
case class ShingleHashSetExpr(child: Expression, n: Int) extends TokenArrayExpression {
  require(n > 0, "shingle width must be positive")
  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    // per-token hashes, nulls skipped
    val th = new Array[Long](m)
    var cnt = 0
    var t = 0
    while (t < m) {
      if (!arr.isNullAt(t)) {
        th(cnt) = XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
        cnt += 1
      }
      t += 1
    }
    val nSh = if (cnt < n) 1 else cnt - n + 1
    val width = if (cnt < n) cnt else n
    // open-addressing dedup over primitive longs
    var cap = 8
    while (cap < nSh * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nSh)
    var outN = 0
    var i = 0
    while (i < nSh) {
      var acc = 42L
      var j = 0
      while (j < width) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      var slot = (acc.toInt & (cap - 1))
      var found = false
      while (used(slot) && !found) {
        if (table(slot) == acc) found = true else slot = (slot + 1) & (cap - 1)
      }
      if (!found) {
        used(slot) = true; table(slot) = acc
        out(outN) = acc; outN += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of the most frequent token, in one pass over the row — the
  * per-row kernel of the Gopher-style top-token-fraction filter. The
  * explode → groupBy(doc, tok) → groupBy(doc) spelling shuffles a row
  * per distinct token per doc; a per-doc mode is per-row math and needs
  * no shuffle at all. Tokens are keyed by xxhash64 digest in a per-row
  * open-addressing table (two distinct tokens colliding is ~2⁻⁶⁴ per
  * doc — below any corpus noise floor). Empty / all-null input → 0. */
case class TopTokenCountExpr(child: Expression) extends TokenArrayExpression {
  override def prettyName: String = "graft_top_tok_count"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var cap = 8
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    var best = 0
    var t = 0
    while (t < m) {
      if (!arr.isNullAt(t)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
        var slot = h.toInt & (cap - 1)
        while (cnts(slot) != 0 && keys(slot) != h) slot = (slot + 1) & (cap - 1)
        keys(slot) = h
        cnts(slot) += 1
        if (cnts(slot) > best) best = cnts(slot)
      }
      t += 1
    }
    best.toLong
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** |A ∩ B| for two long-array SETS (e.g. [[ShingleHashSetExpr]] outputs)
  * without materializing the intersection: open-addressing probe of the
  * smaller side, one counter. `size(array_intersect(a, b))` builds (and
  * immediately discards) the intersection array per row — on a verify
  * stage scoring tens of thousands of candidate pairs against ~400-element
  * shingle sets, the allocation is the cost. Inputs are treated as sets
  * (duplicates in either side count once, matching array_intersect's
  * distinct semantics on pre-deduped inputs). Null array → null. Null
  * ELEMENTS are skipped — unlike `array_intersect`, which counts a null
  * present on both sides as one intersecting element; the graft callers
  * all feed containsNull=false shingle arrays where the two agree. */
case class ArrayLongIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def prettyName: String = "graft_intersect_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[ArrayData]
    var b = r.asInstanceOf[ArrayData]
    if (a.numElements() > b.numElements()) { val t = a; a = b; b = t }
    val n = a.numElements()
    if (n == 0) return 0L
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var slot = h.toInt & (cap - 1)
        while (used(slot) && keys(slot) != h) slot = (slot + 1) & (cap - 1)
        used(slot) = true; keys(slot) = h
      }
      i += 1
    }
    // separate matched[] (never clear used[] — an open-addressing delete
    // would break other keys' probe chains) so dups in b count once
    val matched = new Array[Boolean](cap)
    var cnt = 0L
    val m = b.numElements()
    var j = 0
    while (j < m) {
      if (!b.isNullAt(j)) {
        val h = b.getLong(j)
        var slot = h.toInt & (cap - 1)
        var found = false
        while (used(slot) && !found) {
          if (keys(slot) == h) found = true else slot = (slot + 1) & (cap - 1)
        }
        if (found && !matched(slot)) { matched(slot) = true; cnt += 1 }
      }
      j += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fraction of agreeing slots between two equal-length MinHash signatures
  * (= the LSH estimate of Jaccard similarity). A codegen'd primitive loop:
  * the HOF spelling `size(filter(zip_with(a, b, _ === _), p => p)) / k`
  * allocates two intermediate arrays per row AND falls back to interpreted
  * lambda evaluation (higher-order functions have no doGenCode), which
  * dominates candidate-pair scoring at scale. Mismatched lengths → null. */
case class MinHashAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_minhash_agree"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var eq = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val eq = ctx.freshName("eq")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  ${ev.value} = ((double) $eq) / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection (hyperplane) LSH signature of a float/double
  * vector: bit j = sign of ⟨v, r_j⟩ for `nbits` pseudo-random Rademacher
  * (±1) hyperplanes derived deterministically from xxhash64 — so the
  * signature is stable across executors, sessions and runs with no
  * broadcast of a projection matrix. P[bit agrees] = 1 − θ/π (the classic
  * SimHash-for-cosine bound), so Hamming distance on signatures estimates
  * angular distance; banding the signature buckets near-neighbors for a
  * candidate join exactly like MinHash-LSH does for Jaccard. */
case class HyperplaneSigExpr(child: Expression, nbits: Int) extends UnaryExpression
    with CodegenFallback {
  require(nbits > 0 && nbits <= 64, "nbits must be in 1..64")
  override def prettyName: String = "graft_hyperplane_sig"
  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.catalogString}")
  }

  // Rademacher plane matrix, built once per (instance, dim) — deterministic,
  // so rebuilt copies on other executors are identical. The cache is a
  // single volatile reference to an immutable (dim, planes) pair: a thread
  // either sees null / a stale pair (and rebuilds the same deterministic
  // matrix) or a fully published one — never a dim that matches with a
  // partially written array (the JMM hazard of two separate plain fields).
  @transient @volatile private var planeCache: (Int, Array[Byte]) = _
  private def planesFor(dim: Int): Array[Byte] = {
    val cached = planeCache
    if (cached != null && cached._1 == dim) cached._2
    else {
      val p = new Array[Byte](nbits * dim)
      var j = 0
      while (j < nbits * dim) {
        p(j) = if ((XXH64.hashLong(j.toLong, 42L) & 1L) == 1L) 1 else -1
        j += 1
      }
      planeCache = (dim, p)
      p
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val p = planesFor(dim)
    var sig = 0L
    var j = 0
    while (j < nbits) {
      var s = 0.0
      var i = 0
      val off = j * dim
      while (i < dim) {
        val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        s += (if (p(off + i) == 1) x else -x)
        i += 1
      }
      if (s > 0.0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused PII scrub: counts AND redacts the three PII patterns in ONE
  * expression — `struct(n_emails, n_ips, n_phones, redacted)`.
  *
  * Semantics are EXACTLY the 6-expression spelling it replaces
  * ([[graft.operators.Curation.piiRedact]]'s original form, mirrored by
  * the DuckDB oracle): each count is the number of non-overlapping
  * matches on the ORIGINAL text, while redaction is sequential
  * email → IP → phone (each pass over the previous pass's output).
  * Fusing buys: one UTF8String→String materialization instead of six,
  * the email pass counts and replaces in a single matcher scan, and a
  * no-match replace pass returns the input reference without copying —
  * for mostly-clean corpora the whole kernel is 3 scans, not 6.
  * CodegenFallback per the file's rule: regex cost dwarfs the span break. */
case class PiiScrubExpr(child: Expression, emailRe: String, ipRe: String,
    phoneRe: String) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_pii_scrub"
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  @transient private lazy val emailP = java.util.regex.Pattern.compile(emailRe)
  @transient private lazy val ipP = java.util.regex.Pattern.compile(ipRe)
  @transient private lazy val phoneP = java.util.regex.Pattern.compile(phoneRe)

  /** Count matches on `in`; literal-replace into a builder only if any. */
  private def countAndReplace(p: java.util.regex.Pattern, in: String,
      repl: String): (Long, String) = {
    val m = p.matcher(in)
    if (!m.find()) return (0L, in)
    val sb = new java.lang.StringBuilder(in.length)
    var n = 0L
    var last = 0
    do {
      sb.append(in, last, m.start()).append(repl)
      last = m.end()
      n += 1
    } while (m.find())
    sb.append(in, last, in.length)
    (n, sb.toString)
  }

  private def countOnly(p: java.util.regex.Pattern, in: String): Long = {
    val m = p.matcher(in)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  override def nullSafeEval(v: Any): Any = {
    val s0 = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val (nEmails, s1) = countAndReplace(emailP, s0, "<EMAIL>")
    // counts are defined on the ORIGINAL text; when the prior passes
    // changed nothing the replace scan's own count IS that count, so the
    // separate count scan is skipped — this is what makes a clean row
    // cost 3 scans (email/ip/phone once each), not 5
    val (nIpRepl, s2) = countAndReplace(ipP, s1, "<IP>")
    val nIps = if (s1 eq s0) nIpRepl else countOnly(ipP, s0)
    val (nPhoneRepl, s3) = countAndReplace(phoneP, s2, "<PHONE>")
    val nPhones = if (s2 eq s0) nPhoneRepl else countOnly(phoneP, s0)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nEmails, nIps, nPhones,
        org.apache.spark.unsafe.types.UTF8String.fromString(s3)))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dedup-key text normalization (the CCNet §3.2 canonicalization run
  * BEFORE hashing/shingling): NFC unicode normalization → lowercase →
  * ASCII digits fold to '0' → runs of [ \t\n\r\f] collapse to one
  * space → trim, all in ONE character pass after the NFC step (no
  * regex engine in the hot path). The output is a DEDUP KEY — two
  * byte-different renderings of the same content (composed vs
  * decomposed accents, case, counters, ragged whitespace) collapse to
  * one key — so the contract is DETERMINISM, not linguistic fidelity:
  * Java's ROOT-locale full case mapping and the oracle's simple
  * folding agree on ASCII/Latin-1 (spec-pinned) and may differ on
  * exotic case edges (İ, ﬁ), which only means those rare keys split,
  * never that dedup corrupts content (the original text is untouched).
  * Whitespace class is the explicit [ \t\n\r\f] — the intersection
  * Java and RE2 spell identically — so the DuckDB replay cannot drift
  * on \\s semantics. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def prettyName: String = "graft_normalize_text"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s0 = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val s1 = java.text.Normalizer.normalize(s0, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(s1.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s1.length) {
      val c = s1.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        pendingSpace = true
      else {
        if (pendingSpace && started) sb.append(' ')
        pendingSpace = false
        started = true
        sb.append(if (c >= '0' && c <= '9') '0' else c)
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONAL n-gram hashes: [[ShingleHashSetExpr]]'s one-string-hash-
  * per-token kernel WITHOUT the dedup — slot i is the hash of the gram
  * starting at token i, so `posexplode` recovers (position, gram-hash)
  * pairs. Replaces the interpreted
  * `transform(sequence, i -> xxhash64(concat_ws(slice)))` spelling the
  * span-dedup family used (per-position slice + string build + string
  * hash through interpreted lambdas — the same ~µs/gram the fused
  * shingle expressions exist to avoid), with identical grouping
  * semantics: gram equality ⇔ hash equality w.h.p. (values are join
  * keys only — the oracles replay on string grams). Fewer than n
  * non-null tokens → one whole-span hash; null elements skipped. */
case class ShingleHashSeqExpr(child: Expression, n: Int) extends TokenArrayExpression {
  require(n > 0, "shingle width must be positive")
  override def prettyName: String = "graft_shingle_hash_seq"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val th = new Array[Long](m)
    var cnt = 0
    var t = 0
    while (t < m) {
      if (!arr.isNullAt(t)) {
        th(cnt) = XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
        cnt += 1
      }
      t += 1
    }
    val nSh = if (cnt < n) 1 else cnt - n + 1
    val width = if (cnt < n) cnt else n
    val out = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var acc = 42L
      var j = 0
      while (j < width) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hashed-n-gram feature buckets for DSIR-style importance weighting:
  * per document, the md5 bucket id of every unigram AND every 2-shingle,
  * in one pass — bucket = (first 4 md5-digest bytes as uint32) mod
  * `buckets`, BIT-IDENTICAL to the SQL formulation
  * `conv(substring(md5(g), 1, 8), 16, 10) % buckets` the DuckDB oracle
  * replays (the hex prefix of a digest IS its leading bytes). The HOF
  * version (`explode(concat(toks, shingles(toks, 2)))` + per-gram
  * `md5`/`conv` Columns) built every bigram STRING through interpreted
  * `transform`/`slice`/`concat_ws` lambdas at ~µs each — ~2 s of the
  * benched query at sf0.1, and the dominant per-row cost of a 100 TB
  * featurization scan. Here the bigram digest is fed token-bytes + ' '
  * + token-bytes directly (no intermediate string), ~40 ns/gram.
  *
  * Parity rules mirrored from [[TextFunctions.shingles]]: fewer than 2
  * tokens → the single whole-text shingle (so a 1-token doc emits its
  * token twice: unigram + degenerate bigram); null elements are skipped
  * in joins and as unigrams. */
case class GramBucketsExpr(child: Expression, buckets: Int) extends TokenArrayExpression {
  require(buckets >= 2, "gram bucket count must be >= 2")
  override def prettyName: String = "graft_gram_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def bucketOf(d: java.security.MessageDigest): Long = {
    val dig = d.digest()
    val u = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    u % buckets
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val d = md.get()
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * n + 1)
    var i = 0
    while (i < n) { // unigrams
      if (!arr.isNullAt(i)) {
        d.reset()
        d.update(arr.getUTF8String(i).getBytes)
        out += bucketOf(d)
      }
      i += 1
    }
    if (n < 2) { // degenerate whole-text shingle (concat_ws of ≤1 token)
      d.reset()
      i = 0
      var first = true
      while (i < n) {
        if (!arr.isNullAt(i)) {
          if (!first) d.update(' '.toByte)
          d.update(arr.getUTF8String(i).getBytes)
          first = false
        }
        i += 1
      }
      out += bucketOf(d)
    } else {
      i = 0
      while (i < n - 1) { // 2-shingles, concat_ws(" ", slice) semantics
        d.reset()
        val aNull = arr.isNullAt(i); val bNull = arr.isNullAt(i + 1)
        if (!aNull) d.update(arr.getUTF8String(i).getBytes)
        if (!aNull && !bNull) d.update(' '.toByte)
        if (!bNull) d.update(arr.getUTF8String(i + 1).getBytes)
        out += bucketOf(d)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Adjacent token pairs as strings — `["a b", "b c", …]` for
  * `[a, b, c]` — the per-round statistic a BPE/WordPiece trainer counts.
  * Fuses the interpreted HOF spelling
  * `transform(sequence(0, size-2), i -> concat(toks[i], ' ', toks[i+1]))`
  * (one lambda invocation + intermediate Column eval per pair, ~µs each
  * — the DSIR trap [[GramBucketsExpr]] removed) into one primitive loop
  * with direct byte-level concat (`UTF8String.concat`). Semantics match
  * the HOF exactly (parity spec-pinned): < 2 elements → empty array; a
  * null element null-propagates through `concat`, so its two pairs are
  * null elements. */
case class AdjacentPairsExpr(child: Expression) extends TokenArrayExpression {
  override def prettyName: String = "graft_adjacent_pairs"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: org.apache.spark.unsafe.types.UTF8String =
      if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i - 1) =
        if (prev == null || cur == null) null
        else org.apache.spark.unsafe.types.UTF8String.concat(prev, space, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One BPE merge round applied to a token array: greedy LEFTMOST
  * non-overlapping replacement of the adjacent pair (a, b) with the
  * merged symbol "a b" — the re-tokenize step of a BPE trainer
  * ([[graft.operators.TextAnalysis.bpeTrain]] iterates it with the
  * round's winning pair). Greedy-leftmost is the standard rule and the
  * one that makes the a = b case deterministic: in a run of equal
  * tokens, positions 0, 2, 4… of the run merge ("a a a" → ["a a", "a"]).
  * Null elements never match (they stay as-is). */
case class BpeMergeExpr(child: Expression, a: String, b: String)
    extends TokenArrayExpression {
  override def prettyName: String = "graft_bpe_merge"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  private val ua = org.apache.spark.unsafe.types.UTF8String.fromString(a)
  private val ub = org.apache.spark.unsafe.types.UTF8String.fromString(b)
  private val merged =
    org.apache.spark.unsafe.types.UTF8String.fromString(s"$a $b")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i + 1 < n && !arr.isNullAt(i + 1) &&
          cur.equals(ua) && arr.getUTF8String(i + 1).equals(ub)) {
        out.add(merged); i += 2
      } else {
        out.add(cur); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass per-document repetition/quality statistics — the integer
  * cores of the Gopher quality rules (Rae et al. 2021, "Scaling Language
  * Models", Appendix A1.1: word-count bounds, mean word length,
  * alphabetic-word ratio, most-frequent-n-gram character fraction,
  * duplicated-n-gram character coverage). The published filter is the
  * standard pre-training admission gate; computing its statistics
  * relationally takes five n-gram explode→groupBy aggregations PER
  * DOCUMENT STREAM — this kernel computes all of them in one traversal of
  * the token array with zero shuffles, the shape a 100 TB quality pass
  * needs (a pure map over the corpus scan).
  *
  * Returns a struct of EXACT LONGS — every published fraction is derived
  * downstream as one IEEE division of two of these (bit-reproducible
  * engine/oracle, the fixed-point discipline every txt_* oracle rides):
  *  - `n_words`, `word_chars` (Σ token length, separators excluded),
  *    `n_alpha` (tokens containing an ASCII letter);
  *  - `top2_chars`/`top3_chars`/`top4_chars`: max over positional
  *    n-grams of count·length(gram) with the n−1 joining spaces counted
  *    (ties need no break — the max is over the product);
  *  - `cov5`/`cov10`: token POSITIONS covered by at least one occurrence
  *    of an n-gram appearing ≥2× in the doc (overlap counted once — true
  *    coverage, not the Σcount·len upper bound reimplementations use).
  *
  * Gram identity is the exact space-joined token string (equals DuckDB's
  * `array_to_string(toks[i:i+n-1], ' ')` grouping — no hashing, no
  * collision caveat). Null elements read as "" (`string_split` never
  * yields null elements; defensive only). Null array → null. */
case class GopherStatsExpr(child: Expression) extends TokenArrayExpression {
  override def prettyName: String = "graft_gopher_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("top4_chars", LongType, nullable = false),
    StructField("cov5", LongType, nullable = false),
    StructField("cov10", LongType, nullable = false)))

  private val TopNs = Array(2, 3, 4)
  private val CovNs = Array(5, 10)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[String](n)
    var wordChars = 0L
    var nAlpha = 0L
    var t = 0
    while (t < n) {
      val s = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      toks(t) = s
      wordChars += s.length
      var hasAlpha = false
      var c = 0
      while (c < s.length && !hasAlpha) {
        val ch = s.charAt(c)
        if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')) hasAlpha = true
        c += 1
      }
      if (hasAlpha) nAlpha += 1
      t += 1
    }
    def gramAt(i: Int, g: Int): String = {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + g) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      sb.toString
    }
    // most-frequent-n-gram char mass: max over grams of count·len
    val tops = TopNs.map { g =>
      if (n < g) 0L
      else {
        val counts = new java.util.HashMap[String, Long]()
        var i = 0
        while (i <= n - g) {
          counts.merge(gramAt(i, g), 1L, (a, b) => a + b)
          i += 1
        }
        var best = 0L
        counts.forEach { (k, c) =>
          val mass = c * k.length
          if (mass > best) best = mass
        }
        best
      }
    }
    // duplicated-n-gram coverage: positions under ≥1 occurrence of a
    // gram seen ≥2×, overlaps counted once (two passes: count, mark)
    val covs = CovNs.map { g =>
      if (n < g) 0L
      else {
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i <= n - g) {
          counts.merge(gramAt(i, g), 1, (a, b) => a + b)
          i += 1
        }
        val covered = new Array[Boolean](n)
        i = 0
        while (i <= n - g) {
          if (counts.get(gramAt(i, g)) >= 2) {
            var p = i
            while (p < i + g) { covered(p) = true; p += 1 }
          }
          i += 1
        }
        var cov = 0L
        var p = 0
        while (p < n) { if (covered(p)) cov += 1; p += 1 }
        cov
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n.toLong, wordChars, nAlpha, tops(0), tops(1), tops(2), covs(0), covs(1))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  private def litStr(e: Expression): String =
    e.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString

  /** Idempotent per-session registration (same pattern as
    * [[VectorExpressions.register]] — probe the registry, retain nothing). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_minhash"))) {
      reg.createOrReplaceTempFunction("graft_minhash",
        es => MinHashSigExpr(es(0), es(1).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_simhash",
        es => SimHash64Expr(es.head), "built-in")
      reg.createOrReplaceTempFunction("graft_minhash_agree",
        es => MinHashAgreeExpr(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_shingle_hashes",
        es => ShingleHashSetExpr(es(0), es(1).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_hyperplane_sig",
        es => HyperplaneSigExpr(es(0), es(1).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_top_tok_count",
        es => TopTokenCountExpr(es.head), "built-in")
      reg.createOrReplaceTempFunction("graft_pii_scrub",
        es => PiiScrubExpr(es(0), litStr(es(1)), litStr(es(2)), litStr(es(3))),
        "built-in")
      reg.createOrReplaceTempFunction("graft_minhash_hashes",
        es => MinHashSigFromHashesExpr(es(0),
          es(1).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_lsh_band_keys",
        es => LshBandKeysExpr(es(0),
          es(1).eval().asInstanceOf[Number].intValue(),
          es(2).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_intersect_count",
        es => ArrayLongIntersectCountExpr(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_gram_buckets",
        es => GramBucketsExpr(es(0),
          es(1).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_shingle_hash_seq",
        es => ShingleHashSeqExpr(es(0),
          es(1).eval().asInstanceOf[Number].intValue()), "built-in")
      reg.createOrReplaceTempFunction("graft_adjacent_pairs",
        es => AdjacentPairsExpr(es.head), "built-in")
      reg.createOrReplaceTempFunction("graft_bpe_merge",
        es => BpeMergeExpr(es(0), litStr(es(1)), litStr(es(2))), "built-in")
      reg.createOrReplaceTempFunction("graft_gopher_stats",
        es => GopherStatsExpr(es.head), "built-in")
      reg.createOrReplaceTempFunction("graft_normalize_text",
        es => NormalizeTextExpr(es.head), "built-in")
    }
  }

  def topTokenCount(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("graft_top_tok_count", toks)
  }

  def minhashSig(spark: SparkSession, toks: Column, k: Int): Column = {
    register(spark); call_function("graft_minhash", toks, lit(k))
  }
  def minhashSigFromHashes(spark: SparkSession, hashes: Column, k: Int): Column = {
    register(spark); call_function("graft_minhash_hashes", hashes, lit(k))
  }
  def lshBandKeysLong(spark: SparkSession, sig: Column, bands: Int, rows: Int): Column = {
    register(spark); call_function("graft_lsh_band_keys", sig, lit(bands), lit(rows))
  }
  def intersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_intersect_count", a, b)
  }
  def simhash64(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("graft_simhash", toks)
  }
  def minhashAgree(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_minhash_agree", a, b)
  }
  def shingleHashes(spark: SparkSession, toks: Column, n: Int): Column = {
    register(spark); call_function("graft_shingle_hashes", toks, lit(n))
  }
  def gramBuckets(spark: SparkSession, toks: Column, buckets: Int): Column = {
    register(spark); call_function("graft_gram_buckets", toks, lit(buckets))
  }
  def shingleHashSeq(spark: SparkSession, toks: Column, n: Int): Column = {
    register(spark); call_function("graft_shingle_hash_seq", toks, lit(n))
  }
  def adjacentPairs(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("graft_adjacent_pairs", toks)
  }
  def bpeMerge(spark: SparkSession, toks: Column, a: String, b: String): Column = {
    register(spark); call_function("graft_bpe_merge", toks, lit(a), lit(b))
  }
  def gopherStats(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("graft_gopher_stats", toks)
  }
  def hyperplaneSig(spark: SparkSession, vec: Column, nbits: Int): Column = {
    register(spark); call_function("graft_hyperplane_sig", vec, lit(nbits))
  }
  def piiScrub(spark: SparkSession, text: Column, emailRe: String,
      ipRe: String, phoneRe: String): Column = {
    register(spark)
    call_function("graft_pii_scrub", text, lit(emailRe), lit(ipRe), lit(phoneRe))
  }
  def normalizeText(spark: SparkSession, text: Column): Column = {
    register(spark); call_function("graft_normalize_text", text)
  }
}
