package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the vector-compression leg of the ANN
  * triad (IVF partitions the corpus, LSH buckets it, PQ SHRINKS it).
  *
  * A D-dim embedding splits into `m` subvectors of D/m dims; each
  * subvector is replaced by the index of its nearest subspace centroid
  * from a `ks`-entry codebook. A 512-dim float vector (2 KiB) becomes m
  * bytes (m=8 ⇒ 256× compression) — the difference between "embeddings
  * spill to disk per query" and "the whole 100 TB corpus's codes fit in
  * cluster RAM". Scoring is asymmetric (ADC): the query stays exact, its
  * per-subspace dot products with every centroid are precomputed into an
  * m×ks lookup table, and a candidate's approximate score is m table
  * lookups — no float math per row at scan time.
  *
  * Division of labor mirrors faiss: TRAINING runs driver-side on a small
  * deterministic sample (k-means over ≤ a few 10⁴ vectors is sub-second
  * and avoids m×iters distributed jobs); ENCODING and SCORING are native
  * expressions over the full corpus with the codebook riding into the
  * plan as a foldable literal — broadcast-by-construction, zero shuffle,
  * same shape as [[VectorExpressions.NearestCentroidExpr]].
  */
object PqExpressions {

  /** Deterministic per-subspace k-means (Lloyd's, `iters` rounds).
    * Init = the first `ks` sample subvectors (callers pass a
    * hash-ordered sample, so init is pseudo-random but reproducible);
    * empty clusters keep their previous centroid. Returns the flattened
    * codebook: entry `j*ks + c` is centroid `c` of subspace `j`. */
  def train(sample: Array[Array[Double]], m: Int, ks: Int, iters: Int = 8)
      : Array[Array[Double]] = {
    require(sample.nonEmpty, "PQ training needs a non-empty sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val book = new Array[Array[Double]](m * ks)
    var j = 0
    while (j < m) {
      val off = j * sub
      var c = 0
      while (c < ks) {
        val src = sample(c % sample.length)
        book(j * ks + c) = java.util.Arrays.copyOfRange(src, off, off + sub)
        c += 1
      }
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](sub))
        val counts = new Array[Int](ks)
        var r = 0
        while (r < sample.length) {
          val v = sample(r)
          var best = 0; var bestD = Double.MaxValue
          c = 0
          while (c < ks) {
            val cent = book(j * ks + c)
            var d = 0.0; var i = 0
            while (i < sub) {
              val diff = v(off + i) - cent(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += v(off + i); i += 1 }
          counts(best) += 1
          r += 1
        }
        c = 0
        while (c < ks) {
          if (counts(c) > 0) {
            var i = 0
            while (i < sub) { sums(c)(i) /= counts(c); i += 1 }
            book(j * ks + c) = sums(c)
          }
          c += 1
        }
        it += 1
      }
      j += 1
    }
    book
  }

  /** ADC lookup table for `query` against a flattened codebook:
    * entry `j*ks + c` = dot(query subvector j, centroid c of subspace j),
    * so Σ_j lut(j*ks + codes(j)) approximates dot(query, vec). */
  def adcLut(query: Array[Double], book: Array[Array[Double]],
      m: Int, ks: Int): Array[Double] = {
    val sub = query.length / m
    val lut = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val cent = book(j * ks + c)
        var d = 0.0; var i = 0
        while (i < sub) { d += query(j * sub + i) * cent(i); i += 1 }
        lut(j * ks + c) = d
        c += 1
      }
      j += 1
    }
    lut
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_pq_encode"))) {
      reg.createOrReplaceTempFunction("graft_pq_encode",
        es => PqEncodeExpr(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue()),
        "built-in")
      reg.createOrReplaceTempFunction("graft_pq_adc",
        es => PqAdcExpr(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue()),
        "built-in")
    }
  }

  /** Encode `vec` to its `m` PQ codes against a driver-held codebook. */
  def pqEncode(spark: SparkSession, vec: Column,
      book: Seq[Seq[Double]], ks: Int): Column = {
    register(spark)
    call_function("graft_pq_encode", vec, typedlit(book), lit(ks))
  }

  /** ADC score of a code array against a query's lookup table. */
  def pqAdc(spark: SparkSession, codes: Column,
      lut: Seq[Double], ks: Int): Column = {
    register(spark)
    call_function("graft_pq_adc", codes, typedlit(lut), lit(ks))
  }
}

/** vec → array<int> of m subspace codes (argmin-L2 per subspace).
  * `cents` is the foldable flattened codebook (m·ks entries of D/m dims).
  * CodegenFallback: array-returning, and the per-row cost is the
  * O(m·ks·D/m) = O(ks·D) argmin loop, not expression dispatch. */
case class PqEncodeExpr(vec: Expression, cents: Expression, ks: Int)
    extends BinaryExpression with CodegenFallback {
  require(ks > 0, "ks must be positive")
  override def prettyName: String = "graft_pq_encode"
  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = cents.foldable && (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<double>>), " +
        s"got ${vec.dataType.catalogString}, ${cents.dataType.catalogString}")
  }

  @transient private lazy val book: Array[Array[Double]] = {
    val cData = cents.eval().asInstanceOf[ArrayData]
    require(cData.numElements() % ks == 0,
      s"$prettyName: codebook length ${cData.numElements()} not a multiple of ks=$ks")
    Array.tabulate(cData.numElements())(i => cData.getArray(i).toDoubleArray())
  }

  override def nullSafeEval(v: Any, cv: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = book.length / ks
    if (m == 0) return null
    val sub = book(0).length
    if (a.numElements() != m * sub) return null
    val isF = vecIsFloat
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val cent = book(j * ks + c)
        var d = 0.0; var i = 0
        while (i < sub) {
          val x = if (isF) a.getFloat(off + i).toDouble else a.getDouble(off + i)
          val diff = x - cent(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, cents = r)
}

/** codes → Σ_j lut(j·ks + codes(j)): the m-lookup ADC score. Scalar and
  * in the per-row scan hot path → real codegen via a plan reference
  * object (same pattern as [[VectorExpressions.NearestCentroidExpr]]). */
case class PqAdcExpr(codes: Expression, lut: Expression, ks: Int)
    extends BinaryExpression {
  require(ks > 0, "ks must be positive")
  override def prettyName: String = "graft_pq_adc"
  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val lutOk = lut.foldable && (lut.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (codesOk && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, foldable array<double>), " +
        s"got ${codes.dataType.catalogString}, ${lut.dataType.catalogString}")
  }

  @transient private lazy val table: Array[Double] =
    lut.eval().asInstanceOf[ArrayData].toDoubleArray()

  /** NaN = invalid-codes sentinel the codegen path maps to SQL NULL. */
  def score(a: ArrayData): Double = {
    val m = table.length / ks
    if (a.numElements() != m) return Double.NaN
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = a.getInt(j)
      if (c < 0 || c >= ks) return Double.NaN
      s += table(j * ks + c)
      j += 1
    }
    s
  }

  override def nullSafeEval(c: Any, l: Any): Any = {
    val r = score(c.asInstanceOf[ArrayData])
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val r = ctx.freshName("adc")
      s"""
         |double $r = $ref.score($a);
         |if (Double.isNaN($r)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, lut = r)
}
