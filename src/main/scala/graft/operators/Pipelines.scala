package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** End-to-end corpus curation — the batch analog of the reference's
  * multi-script cleanup chain (`/root/reference/filter_label_paths.py` →
  * `clean_label_etiketler.py` → `clean_and_fill_na.py`, which hands CSVs
  * between processes) generalized to the LLM-training-data pipeline the
  * brief targets, composed from the library's layers in ONE lineage:
  *
  *   scan → quality signals (TextFunctions) → quality gate → language
  *   gate → exact dedup keep-first → MinHash near-dup drop (Dedup) → out
  *
  * Everything before the near-dup stage is a single narrow codegen'd pass
  * plus one window shuffle; the near-dup stage reuses the banded-LSH
  * candidate layout. At 100 TB each stage's shuffle key is explicit
  * (fingerprint, then band) and no stage is corpus×corpus.
  */
object Pipelines {

  /** Survivors of the quality + language + exact-dedup stages, with the
    * signals that decided them (oracle-checkable end to end). */
  def curateExact(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_ratio", stopwordRatio(col("toks")))
      .withColumn("lang_pred", langIdPredict(col("toks")))
    val gated = scored
      .filter(col("n_tokens") >= 5 && col("lang_pred") =!= "und")
    // exact dedup: keep the smallest doc_id per content fingerprint
    val w = Window.partitionBy("fp").orderBy(asc("doc_id"))
    gated
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang_pred", "n_tokens")
      .orderBy("doc_id")
  }

  /** [[curateExact]] with PER-STAGE observed metrics — the engine analog
    * of the reference cleanup scripts' per-stage "removed N rows" logs
    * (`clean_and_fill_na.py`, `clean_label_etiketler.py` print counts
    * after every rule). Uses Spark's `Observation` API: each metric is an
    * accumulator folded into the SAME job (A14 running counters — zero
    * extra passes, exactly-once semantics per action, unlike a
    * `count()` per stage which would rescan).
    *
    * Returns (result, observations). After ONE action on the result,
    * `observations.map(o => o.name -> o.get("rows"))` yields the funnel:
    * `scanned` → `quality_gated` (n_tokens + langid survivors) →
    * `exact_kept` (one representative per fingerprint). */
  def curateExactObserved(s: SparkSession, d: String): (DataFrame, Seq[Observation]) = {
    val obScan = Observation("scanned")
    val obGate = Observation("quality_gated")
    val obKept = Observation("exact_kept")
    val scored = Tables.documents(s, d)
      .observe(obScan, count(lit(1)).as("rows"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("lang_pred", langIdPredict(col("toks")))
    val gated = scored
      .filter(col("n_tokens") >= 5 && col("lang_pred") =!= "und")
      .observe(obGate, count(lit(1)).as("rows"))
    val w = Window.partitionBy("fp").orderBy(asc("doc_id"))
    val kept = gated
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang_pred", "n_tokens")
      .orderBy("doc_id")
      // observe ABOVE the global sort: the sort's range-partitioner runs a
      // SAMPLING pass over its child, which would fire a below-sort
      // accumulator twice (sample + real pass). Above the sort it fires
      // exactly once per action.
      .observe(obKept, count(lit(1)).as("rows"))
    (kept, Seq(obScan, obGate, obKept))
  }

  /** Full curation: [[curateExact]] minus near-duplicates, with TRANSITIVE
    * clustering — ≥0.9-estimated MinHash pairs are closed into connected
    * components ([[Dedup.dupClusters]]) and exactly one representative
    * (the smallest doc id) survives per component, so A≈B≈C collapses to
    * one doc even when A and C never banded together. xxhash64-based →
    * rows-only check; the spec pins behavior on a corpus with known dups. */
  def curate(s: SparkSession, d: String): DataFrame = {
    // base feeds both the signing input and the final join — materialize
    // once instead of recomputing the quality/langid scan per consumer
    val base = curateExact(s, d).localCheckpoint()
    val blk = Tables.documents(s, d)
      .join(base.select("doc_id"), "doc_id") // only survivors are signed
      .withColumn("blk", concat_ws("_", col("lang"), expr("n_chars DIV 100")))
    // Banding tuned to the 0.9 threshold: 8 bands × 8 rows collide at
    // ~(1/8)^(1/8) ≈ 0.77, so j=0.9 pairs band with ~99% recall while the
    // 0.5-similar mass (which 16×4 banding — tuned for a 0.5 threshold —
    // would surface and then discard) mostly never reaches the scorer. On
    // a near-dup-heavy corpus that is a ~20× cut in candidate pairs.
    val pairs = Dedup
      .minhashPairs(blk, col("doc_id"), col("text"), col("blk"),
        bands = 8, rows = 8, minEst = 0.9)
    val clusters = Dedup.dupClusters(pairs)
    base.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .select("doc_id", "lang_pred", "n_tokens")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate_exact" -> curateExact,
    "pipeline_curate" -> curate)

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate_exact" -> {
      val hits = LangMarkers.map { case (l, m) =>
        s"len(list_filter(list_distinct(toks), x -> list_contains([${m.map(x => s"'$x'").mkString(", ")}], x))) AS h_$l"
      }.mkString(", ")
      val best = LangMarkers.map { case (l, _) => s"h_$l" }.mkString("greatest(", ", ", ")")
      val cases = LangMarkers.map { case (l, _) =>
        s"WHEN h_$l = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
         h AS (SELECT doc_id, text, toks, $hits FROM t),
         b AS (SELECT *, $best AS best FROM h),
         lp AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE $cases ELSE 'und' END AS lang_pred
           FROM b),
         g AS (SELECT * FROM lp WHERE n_tokens >= 5 AND lang_pred <> 'und'),
         r AS (SELECT doc_id, lang_pred, n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM g)
         SELECT doc_id, lang_pred, n_tokens FROM r WHERE rn = 1 ORDER BY doc_id"""
    })
}
