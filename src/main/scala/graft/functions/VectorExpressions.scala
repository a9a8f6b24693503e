package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Fused, codegen'd vector kernels (SURVEY.md §4 "custom Catalyst work").
  *
  * The HOF formulation in [[VectorFunctions]] ([[org.apache.spark.sql.functions.zip_with]] +
  * `aggregate`) is correct and codegen'd, but materializes an intermediate
  * array per row and makes 2·dim lambda evaluations. These expressions do a
  * single primitive loop per row with no allocation — the shape you want
  * when scoring billions of vectors in a brute-force kNN scan (the
  * reference's retrieval model is exactly such a scan,
  * `/root/reference/search_with_segments.py:156-164`).
  *
  * [[CosineSimilarityExpr]] is additionally *fused*: dot, ‖a‖² and ‖b‖² in
  * one pass instead of three.
  *
  * Elements are widened to Double before multiply/accumulate — identical
  * fold order and precision as the HOF versions, so the two formulations
  * are bit-compatible and interchangeable under tests: mismatched lengths
  * yield NULL (as `zip_with`'s null-padding does) and a zero-norm cosine
  * yields NULL (as the `nullif`-guarded HOF cosine does). Null array
  * *elements* are not supported (embedding vectors never have them).
  */
trait VectorBinaryArithmetic extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // NULL is also produced for length-mismatch / zero-norm inputs, not just
  // null children.
  override def nullable: Boolean = true

  protected def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  protected def getter(e: Expression): String =
    if (elementType(e).contains(FloatType)) "getFloat" else "getDouble"

  protected def get(a: ArrayData, e: Expression, i: Int): Double =
    if (elementType(e).contains(FloatType)) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Σ aᵢ·bᵢ in one primitive-array pass. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorBinaryArithmetic {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, left, i) * get(b, right, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.${getter(left)}($i)) * ((double) $b.${getter(right)}($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cos(a,b) = Σab / sqrt(Σa²·Σb²), all three sums in ONE pass. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends VectorBinaryArithmetic {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, left, i); val y = get(b, right, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.${getter(left)}($i);
         |    double $y = (double) $b.${getter(right)}($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ‖a‖₂ in one pass. */
case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_l2norm"
  override def dataType: DataType = DoubleType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_l2norm requires array<float|double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      val g = if (isFloat) "getFloat" else "getDouble"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$g($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Registration + Column-level accessors for the fused kernels.
  *
  * Registered through the session FunctionRegistry and invoked via
  * `call_function` — stable across Spark 4.x Column internals, and makes
  * the kernels usable from `spark.sql("... graft_cosine(a, b) ...")` too.
  */
object VectorExpressions {
  /** Idempotent per-session registration probed via the session's own
    * FunctionRegistry — no references to SparkSession are retained here, so
    * stopped sessions (e.g. per-test sessions) remain garbage-collectable. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"))) {
      reg.createOrReplaceTempFunction("graft_dot", es => DotProductExpr(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_cosine", es => CosineSimilarityExpr(es(0), es(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_l2norm", es => L2NormExpr(es.head), "built-in")
    }
  }

  def fusedDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_dot", a, b)
  }
  def fusedCosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_cosine", a, b)
  }
  def fusedL2Norm(spark: SparkSession, a: Column): Column = {
    register(spark); call_function("graft_l2norm", a)
  }
}
