package graft.operators

import graft.SparkSpec

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("curate: near-dup stage only ever removes docs, reps survive") {
    val exact = Pipelines.curateExact(spark, d).select("doc_id").as[Long].collect().toSet
    val full = Pipelines.curate(spark, d).select("doc_id").as[Long].collect().toSet
    assert(full.subsetOf(exact), "near-dup drop is a refinement")
    assert(full.nonEmpty)
    // every dropped doc has a surviving smaller-id near-dup partner
    val dropped = exact -- full
    if (dropped.nonEmpty) {
      val blk = graft.Tables.documents(spark, d)
        .join(exact.toSeq.toDF("doc_id"), "doc_id")
        .withColumn("blk", org.apache.spark.sql.functions.concat_ws("_",
          $"lang", org.apache.spark.sql.functions.expr("n_chars DIV 100")))
      val pairs = Dedup.minhashPairs(blk, $"doc_id", $"text", $"blk", minEst = 0.9)
      val clusters = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
      dropped.foreach { id =>
        val rep = clusters.get(id)
        assert(rep.isDefined, s"dropped $id must be in a dup cluster")
        assert(rep.get < id && full.contains(rep.get),
          s"dropped $id's representative ${rep.get} must survive")
      }
    }
  }

  test("curateExactObserved: per-stage funnel metrics match independent counts") {
    val d = "/root/testdata/sf0.001"
    val (out, obs) = Pipelines.curateExactObserved(spark, d)
    val result = out.collect() // ONE action; metrics fold into this job
    val m = obs.map(o => o.name -> o.get("rows").asInstanceOf[Long]).toMap
    // the funnel is a funnel
    assert(m("scanned") >= m("quality_gated") && m("quality_gated") >= m("exact_kept"))
    // each stage count equals the independently-computed ground truth
    assert(m("scanned") === graft.Tables.documents(spark, d).count())
    assert(m("exact_kept") === result.length.toLong)
    assert(m("exact_kept") === Pipelines.curateExact(spark, d).count())
    // and the observed variant returns the identical rows
    assert(result.toSeq === Pipelines.curateExact(spark, d).collect().toSeq)
  }

  test("curateExact: quality gate and exact-dedup keep-first on known rows") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "too short"),                                    // < 5 tokens
      (4L, "zz qq xx yy ww vv uu")                          // no lang markers → und
    ).toDF("doc_id", "text")
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy(asc("doc_id"))
    val out = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("lang_pred", langIdPredict(col("toks")))
      .filter(col("n_tokens") >= 5 && col("lang_pred") =!= "und")
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L), "dup 2, short 3, und 4 all removed; first copy kept")
  }
}
