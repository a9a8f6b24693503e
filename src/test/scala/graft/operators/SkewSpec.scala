package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a tail
  private lazy val fact = (1 to 900).map(i => (7L, i.toDouble)) ++
    (1 to 100).map(i => ((i % 10 + 10).toLong, i.toDouble))

  test("saltedCountSum ≡ plain groupBy, hot key split across salts") {
    val df = fact.toDF("k", "v")
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", nSalts = 8)
      .select($"k", $"n", $"sum_v").orderBy("k")
      .as[(Long, Long, Double)].collect().toSeq
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    assert(salted === plain)
  }

  test("saltedJoin ≡ plain inner join") {
    val f = fact.toDF("k", "v")
    val dim = (0 to 20).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(f, dim, "k", nSalts = 4)
      .orderBy("k", "v").as[(Long, Double, String)].collect().toSeq
    val plain = f.join(dim, "k")
      .orderBy("k", "v").as[(Long, Double, String)].collect().toSeq
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("salt is deterministic across evaluations") {
    val df = fact.toDF("k", "v")
    val a = Skew.saltedCountSum(df, Seq("k"), "v").orderBy("k").collect().toSeq
    val b = Skew.saltedCountSum(df, Seq("k"), "v").orderBy("k").collect().toSeq
    assert(a === b)
  }
}
