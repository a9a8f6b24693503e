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
      // same two-stage config as curate: banding proposes, exact verifies
      val cands = Dedup.minhashPairs(blk, $"doc_id", $"text", $"blk",
        uniqTexts = false, shingleN = 3).select("doc_a", "doc_b")
      val pairs = Dedup.verifyJaccard(spark, blk, cands, minJac = 0.9)
        .select("doc_a", "doc_b")
      val clusters = Dedup.dupClusters(pairs)
        .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
      dropped.foreach { id =>
        val rep = clusters.get(id)
        assert(rep.isDefined, s"dropped $id must be in a dup cluster")
        assert(rep.get < id && full.contains(rep.get),
          s"dropped $id's representative ${rep.get} must survive")
      }
    }
  }

  test("curateGopher: rules admit, keep-first dedup among survivors, metrics carried") {
    // 60 distinct 4-char words + 2 stopwords: passes every published
    // gate (n_words 60, mean len ~3.9, no repeated grams)
    val good = "the a " + (1 to 58).map(i => f"w$i%03d").mkString(" ")
    val good2 = "the a " + (1 to 58).map(i => f"v$i%03d").mkString(" ")
    val docs = Seq(
      (10L, good), (20L, good), // exact duplicates, both admissible
      (30L, "short doc only"), // fails the word-count gate
      (40L, good2)
    ).toDF("doc_id", "text")
    val out = Pipelines.curateGopherOn(docs)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(10L, 40L),
      s"gate drops 30, keep-first dedup keeps 10 of {10,20}; got $out")
    assert(out.forall(_._2 === 60L), "n_words metric carried through")
    assert(out.forall(r => r._3 <= 0.2 && r._4 <= 0.15),
      "repetition metrics carried through")
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

  test("curateFullOn: every gate fires on a known corpus, survivors exact") {
    import org.apache.spark.sql.functions._
    // ~29-token clean English base; its one-token-appended variant is a
    // 27/28 ≈ 0.964 three-shingle-Jaccard near-dup in the same block.
    val base = "the quick brown fox jumps over the lazy dog while many other " +
      "animals watch from shade near the old stone bridge by the river bank " +
      "under warm evening light"
    val docs = Seq(
      (1L, base),                     // survives — the near-dup representative
      (2L, base),                     // exact dup of 1 → dropped at stage 4
      (3L, base + " tonight"),        // jac 27/28 ≥ 0.9 vs doc 1 → dropped at stage 5
      (4L, "the the the the the the quick fox"), // top_tok_frac 6/8 → repetition gate
      (5L, "too short"),              // n_tokens < 5 → quality gate
      (6L, "zz qq xx yy ww vv uu"),   // no lang markers → language gate
      (7L, "a completely different sentence about spark catalyst optimizer " +
        "rules and the physical plans they produce in practice") // survives
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val out = Pipelines.curateFullOn(docs)
      .select("doc_id", "lang_pred", "n_tokens")
      .as[(Long, String, Long)].collect().toList
    assert(out.map(_._1) === List(1L, 7L))
    assert(out.forall(_._2 == "en"))
    // and the repetitive doc is dropped by the REPETITION gate, not another
    // stage: it passes quality (8 tokens) and language ("the" marker)
    val rep = Curation.repetitionSignals(
        docs.filter($"doc_id" === 4L), $"doc_id", $"text")
      .select("top_tok_frac").as[Double].head()
    assert(rep > 0.2)
  }

  test("curateFullOn: near-dup drop is keep-smallest within the block") {
    import org.apache.spark.sql.functions._
    val base = "the quick brown fox jumps over the lazy dog while many other " +
      "animals watch from shade near the old stone bridge by the river bank " +
      "under warm evening light"
    // A second near-dup of the SAME base: both later ids drop, smallest stays,
    // even though the two later docs are also near-dups of each other.
    val docs = Seq(
      (10L, base), (11L, base + " tonight"), (12L, base + " today"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val kept = Pipelines.curateFullOn(docs).select("doc_id").as[Long].collect().toList
    assert(kept === List(10L))
    // different block (different lang value) → no pair, both survive
    val split = Seq((20L, base), (21L, base + " tonight"))
      .toDF("doc_id", "text")
      .withColumn("lang", when($"doc_id" === 20L, "en").otherwise("de"))
      .withColumn("n_chars", length(col("text")))
    assert(Pipelines.curateFullOn(split).count() === 2L)
  }

  test("curateIncrementalOn: gates within the increment, exact anti vs existing") {
    import org.apache.spark.sql.functions._
    val base = "a quick brown fox jumps over the lazy dog sleeping near his quiet river"
    val incoming = Seq(
      (100L, base),                      // fp exists in the curated table → dropped
      (101L, base + " again today"),     // genuinely new → survives
      (102L, base + " again today"),     // exact dup WITHIN the increment → dropped
      (103L, "too short")                // quality gate
    ).toDF("doc_id", "text")
    val existing = Seq(Tuple1(base)).toDF("text")
      .select(md5(col("text")).as("fp"))
    val out = Pipelines.curateIncrementalOn(incoming, existing)
      .select("doc_id").as[Long].collect().toList
    assert(out === List(101L))
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
