package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Johnson-Lindenstrauss random-projection family
  * ([[Retrieval.rpSigns]], `vec_rp_project`, `knn_rp`). */
class RpSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("rpSigns: ±1/√m entries, md5 spelling matches the Column-side convention") {
    val signs = Retrieval.rpSigns(16, 64)
    assert(signs.length === 16 && signs.forall(_.length === 64))
    assert(signs.flatten.forall(v => v == 0.25 || v == -0.25))
    // both signs actually occur (a constant matrix would be a degenerate
    // projection that still "passes" every arithmetic check)
    assert(signs.flatten.distinct.toSet === Set(0.25, -0.25))
    // spelling parity with the engine's md5Bucket16 convention: the same
    // string hashed through Spark's md5 must yield the same sign
    val keys = for (j <- 1 to 16; i <- Seq(1, 17, 64)) yield (j, i)
    val viaSpark = keys.toDF("j", "i")
      .select(col("j"), col("i"),
        (substring(md5(concat(lit("rp_"), col("j"), lit("_"), col("i"))), 1, 1)
          < "8").as("pos"))
      .as[(Int, Int, Boolean)].collect()
    viaSpark.foreach { case (j, i, pos) =>
      assert((signs(j - 1)(i - 1) > 0) === pos, s"sign mismatch at ($j,$i)")
    }
  }

  test("vecRpProject: projection is the literal signed sum, deterministic") {
    val signs = Retrieval.rpSigns(16, 64)
    val emb = Array.tabulate(64)(i => (i + 1) * 0.01)
    val df = Seq((7L, emb.map(_.toFloat))).toDF("vec_id", "embedding")
    val r = Retrieval.rpProjected(spark, df)
      .select("rp").as[Seq[Double]].head()
    assert(r.length === 16)
    // expected from the FLOAT-rounded inputs (the stored embedding is
    // float32; the plan casts those values, not the exact doubles)
    val expect = signs.map(row =>
      row.zip(emb.map(_.toFloat.toDouble)).map { case (s, x) => s * x }.sum)
    r.zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    }
    // same call again — the sign matrix is a pure function, not RNG state
    val again = Retrieval.rpProjected(spark, df)
      .select("rp").as[Seq[Double]].head()
    assert(again === r)
  }

  test("knn_rp: 10 exact-cosine-scored rows; sketch pool recalls the exact top-10") {
    val rp = Retrieval.knnRp(spark, d).as[(Long, Double)].collect().toSeq
    assert(rp.length === 10)
    assert(rp.sortBy(-_._2) === rp)
    // scores are EXACT 64-d cosines (stage 2 rescored), not sketch scores
    val ids = rp.map(_._1)
    val exact = graft.Tables.embeddings(spark, d)
      .filter(col("vec_id").isin(ids: _*))
      .crossJoin(broadcast(graft.Tables.embeddings(spark, d)
        .filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(col("vec_id"), round(graft.functions.VectorExpressions.fusedCosine(
        spark, col("embedding").cast("array<double>"),
        col("qv").cast("array<double>")), 6).as("cos"))
      .as[(Long, Double)].collect().toMap
    rp.foreach { case (id, s) => assert(s === exact(id)) }
    // JL recall floor on real data: the 200-wide 16-d pool must recover
    // most of the exact top-10 (measured 9/10 at sf0.001, 8/10 at
    // sf0.01; floor at 8 catches a broken projection, not noise)
    val whole = graft.operators.Search.knnBrute(
      graft.Tables.embeddings(spark, d), col("embedding"),
      graft.Tables.embeddings(spark, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("qv")), k = 10, tie = col("vec_id"))
      .select("vec_id").as[Long].collect().toSet
    assert(ids.count(whole) >= 8, s"recall too low: ${ids.count(whole)}/10")
  }
}
