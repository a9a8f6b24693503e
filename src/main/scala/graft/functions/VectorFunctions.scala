package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernel as composable `Column` functions (SURVEY.md §2.7 V1/V6/V9).
  *
  * The reference computes cosine similarity client-side with numpy
  * (`/root/reference/search_with_segments.py:254-256`) and inside
  * Elasticsearch `script_score` (`search_test_image.py:63`). Here each op is
  * a Catalyst higher-order-function expression tree — fully codegen'd by
  * whole-stage codegen, no UDF/serialization boundary, so a kNN scan stays
  * in one `WholeStageCodegen` span across filter → score → TakeOrdered.
  *
  * All arithmetic is done in Double regardless of the array element type
  * (testdata embeddings are `array<float>`): each element is widened before
  * multiply/accumulate, which matches what the DuckDB oracle does with a
  * `::DOUBLE[]` cast — bit-for-bit summation order parity (left fold).
  *
  * For the hottest path (brute-force kNN over billions of vectors) see
  * [[graft.functions.VectorExpressions]] — a fused single-pass codegen
  * expression with primitive-array access and no per-element lambda calls.
  */
object VectorFunctions {
  private def d(c: Column): Column = c.cast("double")

  /** dot(a, b) = Σ aᵢ·bᵢ, left-to-right fold in Double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** cos(a,b) = dot / (‖a‖·‖b‖). Pre-normalized vectors ⇒ use dotProduct.
    * Zero-norm input ⇒ NULL (ANSI-safe: the denominator goes through
    * `nullif(·, 0)` so Spark 4's default ANSI mode never raises
    * DIVIDE_BY_ZERO, and DuckDB's `x / NULLIF(d, 0)` agrees). */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /** Reference score calibration `cos + 1.0` (search_test_image.py:63). */
  def cosinePlusOne(a: Column, b: Column): Column = cosine(a, b) + lit(1.0)

  /** Reference percentage calibration `((sim+1)/2)*100`
    * (search_with_segments.py:286). */
  def similarityPercentage(sim: Column): Column = (sim + lit(1.0)) / lit(2.0) * lit(100.0)

  /** a / ‖a‖. NOTE: `norm` should be a *materialized column* (e.g. via
    * `withColumn("_norm", l2Norm($"v"))`) so the lambda reads an attribute
    * instead of recomputing the norm per element — at 512 dims that is a
    * 512× difference on the normalize path. */
  def l2NormalizeBy(a: Column, norm: Column): Column =
    transform(a, x => d(x) / norm)

  /** Convenience single-expression normalize (norm recomputed per element —
    * fine for tests/small dims; hot paths use l2NormalizeBy). */
  def l2Normalize(a: Column): Column = l2NormalizeBy(a, l2Norm(a))

  /** Element-wise euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v))

  // --- scalar int8 quantization (SQ8 — faiss-style per-vector scaling) -----

  /** max |x_i| of a vector — the per-vector SQ8 scale denominator.
    * Materialize it as a column before calling [[sq8Codes]] (same
    * attribute-vs-recompute note as [[l2NormalizeBy]]). */
  def sq8MaxAbs(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(d(x))))

  /** Per-vector scalar int8 quantization: code_i = ⌊x_i · 127/maxAbs + ½⌋
    * ∈ [−127, 127] — 4× smaller than float32 at rest. Pure integer-exact
    * double arithmetic (explicit ⌊·+½⌋, not engine-specific `round`), so
    * a DuckDB oracle reproduces the codes bit for bit. A zero vector
    * (maxAbs = 0) quantizes to NULL, not an error.
    *
    * Scoring needs NO dequantization for cosine ranking — cosine is
    * scale-invariant, so `fusedCosine(codes, q)` over the raw int codes
    * equals the dequantized-vector cosine exactly; `maxAbs/127` is only
    * needed to reconstruct values (dot products, L2). Encode is HOF-based
    * (a one-time write-side pass, like the at-rest index builders); the
    * QUERY side runs on the codegen'd cosine kernel. */
  def sq8Codes(a: Column, maxAbs: Column): Column =
    when(maxAbs === lit(0.0), lit(null).cast("array<int>"))
      .otherwise(transform(a, x =>
        floor(d(x) * lit(127.0) / maxAbs + lit(0.5)).cast("int")))
}
