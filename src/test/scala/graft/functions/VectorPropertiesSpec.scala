package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** ScalaCheck-generated property batch for the vector kernels (SURVEY.md
  * §5): rather than a round-trip per sample, all generated cases are
  * evaluated in ONE DataFrame pass and asserted column-wise.
  */
class VectorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val vecGen: Gen[Seq[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-10.0, 10.0)).map(_.toSeq)

  private def samples(n: Int): Seq[(Seq[Double], Seq[Double])] = {
    val g = Gen.zip(vecGen, vecGen)
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  }

  test("cosine: bounded, symmetric, self-similarity 1; dot symmetric; norm ≥ 0") {
    val df = samples(300).toDF("a", "b")
      .select(
        cosine($"a", $"b").as("cab"),
        cosine($"b", $"a").as("cba"),
        cosine($"a", $"a").as("caa"),
        dotProduct($"a", $"b").as("dab"),
        dotProduct($"b", $"a").as("dba"),
        l2Norm($"a").as("na"),
        VectorExpressions.fusedCosine(spark, $"a", $"b").as("fcab"))
      .collect()
    assert(df.length === 300)
    df.foreach { r =>
      if (!r.isNullAt(0)) {
        val (cab, cba, caa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(cab >= -1.0 - 1e-9 && cab <= 1.0 + 1e-9)
        assert(math.abs(cab - cba) < 1e-12, "cosine symmetric")
        assert(math.abs(caa - 1.0) < 1e-9, "self-cosine = 1")
        assert(math.abs(r.getDouble(6) - cab) < 1e-9, "fused matches HOF")
      }
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-9, "dot symmetric")
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("l2Normalize: unit norm and idempotent on generated vectors") {
    val df = samples(200).map(_._1).filter(_.exists(_ != 0.0)).toDF("a")
      .select(
        l2Norm(l2Normalize($"a")).as("n1"),
        l2Norm(l2Normalize(l2Normalize($"a"))).as("n2"))
      .collect()
    df.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("nearestCentroid: generated vectors match a driver-side argmax model") {
    // One codebook, 250 generated vectors evaluated in one DataFrame pass
    // (codegen path), checked row-by-row against a straightforward scala
    // argmax over the same codebook (interpreted model). Ties break to
    // the smallest id in both.
    val cents: Seq[Seq[Double]] = samples(6).take(6).map(_._1)
    val ids: Seq[Long] = Seq(30L, 10L, 50L, 20L, 60L, 40L)
    def model(v: Seq[Double]): Option[Long] = {
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
        if (d == 0.0) Double.NaN else dot / d
      }
      val nv = math.sqrt(v.map(x => x * x).sum)
      if (nv == 0.0) None
      else Some(ids.zip(cents).map { case (id, c) => (id, cos(v, c)) }
        .sortBy { case (id, s) => (-s, id) }.head._1)
    }
    val vs = samples(250).map(_._2) :+ Seq.fill(dim)(0.0) // include zero-norm
    val got = vs.toDF("v")
      .select(VectorExpressions.nearestCentroid(spark, $"v", ids, cents).as("nc"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    vs.zip(got).foreach { case (v, g) => assert(g === model(v), s"vec $v") }
  }

  test("top-k nesting: top-k ⊆ top-(k+1) under deterministic tiebreak") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def topk(k: Int): Seq[Long] = {
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
      e.crossJoin(broadcast(q))
        .select($"vec_id",
          VectorExpressions.fusedCosine(spark, $"embedding", $"qv").as("s"))
        .orderBy(desc("s"), asc("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSeq
    }
    val t5 = topk(5); val t6 = topk(6); val t10 = topk(10)
    assert(t5 === t6.take(5))
    assert(t6 === t10.take(6))
  }
}
