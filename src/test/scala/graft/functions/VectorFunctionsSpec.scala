package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (2L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (3L, Seq(1.0f, 1.0f, 0.0f), Seq(1.0f, 1.0f, 0.0f))
  ).toDF("id", "a", "b")

  test("dotProduct") {
    val r = vecs.select($"id", VectorFunctions.dotProduct($"a", $"b").as("d"))
      .orderBy("id").as[(Long, Double)].collect()
    assert(r(0)._2 === 0.0)
    assert(r(1)._2 === 32.0)
    assert(r(2)._2 === 2.0)
  }

  test("cosine bounds and identity") {
    val r = vecs.select($"id", VectorFunctions.cosine($"a", $"b").as("c"))
      .orderBy("id").as[(Long, Double)].collect()
    assert(math.abs(r(0)._2) < 1e-12)
    assert(r.forall { case (_, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    assert(math.abs(r(2)._2 - 1.0) < 1e-12) // cos(v, v) = 1
  }

  test("cosine of zero vector is NULL, not an ANSI error") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine($"a", $"b").as("c")).collect()
    assert(r(0).isNullAt(0))
  }

  test("l2Normalize yields unit norm; normalize is idempotent") {
    val df = Seq(Tuple1(Seq(3.0f, 4.0f))).toDF("v")
    val n = df.select(VectorFunctions.l2Norm(VectorFunctions.l2Normalize($"v")).as("n"))
      .as[Double].head()
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("l2Distance") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.l2Distance($"a", $"b")).as[Double].head() === 5.0)
  }

  test("fused expressions match HOF formulation incl. edge cases") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)), // normal
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 2.0f, 3.0f)), // zero norm
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))        // length mismatch
    ).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct($"a", $"b").as("hof_dot"),
      VectorExpressions.fusedDot(spark, $"a", $"b").as("f_dot"),
      VectorFunctions.cosine($"a", $"b").as("hof_cos"),
      VectorExpressions.fusedCosine(spark, $"a", $"b").as("f_cos"),
      VectorFunctions.l2Norm($"a").as("hof_n"),
      VectorExpressions.fusedL2Norm(spark, $"a").as("f_n")
    ).collect()
    r.foreach { row =>
      assert(row.isNullAt(0) === row.isNullAt(1), s"dot null parity: $row")
      if (!row.isNullAt(0)) assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-12)
      assert(row.isNullAt(2) === row.isNullAt(3), s"cos null parity: $row")
      if (!row.isNullAt(2)) assert(math.abs(row.getDouble(2) - row.getDouble(3)) < 1e-12)
      assert(math.abs(row.getDouble(4) - row.getDouble(5)) < 1e-12)
    }
  }

  test("fused kernels callable from SQL") {
    VectorExpressions.register(spark)
    val r = spark.sql("SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("VectorMean: element-wise mean across rows, per group") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 4.0f)),
      ("b", Seq(10.0f, 20.0f))
    ).toDF("k", "v")
    val r = df.groupBy("k").agg(VectorAggregates.vectorMean($"v").as("m"))
      .orderBy("k").as[(String, Seq[Float])].collect()
    assert(r(0)._2 === Seq(2.0f, 3.0f))
    assert(r(1)._2 === Seq(10.0f, 20.0f))
  }

  test("VectorMean: ragged input pads with zeros regardless of order") {
    val df = Seq(("a", Seq(2.0f, 2.0f, 4.0f)), ("a", Seq(2.0f, 2.0f))).toDF("k", "v")
    val r = df.groupBy("k").agg(VectorAggregates.vectorMean($"v").as("m"))
      .as[(String, Seq[Float])].head()
    assert(r._2 === Seq(2.0f, 2.0f, 2.0f))
  }
}
