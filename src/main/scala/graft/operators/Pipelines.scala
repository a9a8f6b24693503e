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
  def curateExact(s: SparkSession, d: String): DataFrame =
    // sampled-sort cut (r21, the TextAnalysis.gopherQuality note): the
    // final range exchange samples its child, which would re-run the
    // post-window half of the chain per action; the cut bounds the
    // sampling to the materialized 3-column survivor rows
    curateExactUnsorted(s, d)
      .localCheckpoint(eager = false)
      .orderBy("doc_id")

  /** The [[curateExact]] survivor set WITHOUT the presentation sort —
    * the frame composing pipelines consume: [[curate]]'s base join and
    * the banding input don't care about order, and pulling the sort out
    * of the shared base removed a whole range exchange (plus its
    * child-sampling double execution) from every downstream action. */
  private def curateExactUnsorted(s: SparkSession, d: String): DataFrame = {
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
      // NO sampled-sort cut here (r21 A/B: the sort's child sits above
      // the fingerprint window's exchange, so AQE's bounds sampling
      // re-reads the materialized stage — the cut's extra job cost more
      // than it saved, 1.01 → 1.20 s isolated)
      .orderBy("doc_id")
      // observe ABOVE the global sort: the sort's range-partitioner runs a
      // SAMPLING pass over its child, which would fire a below-sort
      // accumulator twice (sample + real pass). Above the sort it fires
      // exactly once per action.
      .observe(obKept, count(lit(1)).as("rows"))
    (kept, Seq(obScan, obGate, obKept))
  }

  /** Full curation: [[curateExact]] minus near-duplicates, with TRANSITIVE
    * clustering — near-dup pairs are closed into connected components
    * ([[Dedup.dupClusters]]) and exactly one representative (the smallest
    * doc id) survives per component, so A≈B≈C collapses to one doc even
    * when A and C never banded together.
    *
    * The near-dup stage is the production-standard TWO-STAGE shape:
    * MinHash banding PROPOSES candidates ([[Dedup.minhashPairs]], signing
    * the same 3-gram sets the verifier measures), exact 3-shingle Jaccard
    * ≥ 0.9 VERIFIES ([[Dedup.verifyJaccard]]). The verify stage is what
    * makes the whole pipeline oracle-checked: the output is exactly
    * "survivors minus non-representatives of the ≥0.9-Jaccard closure",
    * which DuckDB recomputes with an all-in-block-pairs scan + recursive
    * CTE — no hash function in the answer (the banding config has recall
    * ≈1 at the verify threshold, see verifyJaccard's doc). An est-only
    * single-stage config (skip the verify scan) remains available through
    * [[Dedup.minhashPairs]] directly when the extra pass matters more
    * than exactness. */
  def curate(s: SparkSession, d: String): DataFrame = {
    // base feeds both the signing input and the final join — materialize
    // once instead of recomputing the quality/langid scan per consumer.
    // The UNSORTED survivor set (r21): checkpointing the sorted form
    // paid the range sort plus its child-sampling double execution for
    // an order the joins below never use; the declared order comes from
    // the final orderBy.
    val base = curateExactUnsorted(s, d).localCheckpoint()
    val blk = Tables.documents(s, d)
      .join(base.select("doc_id"), "doc_id") // only survivors are signed
      .withColumn("blk", concat_ws("_", col("lang"), expr("n_chars DIV 100")))
    val cands = Dedup
      .minhashPairs(blk, col("doc_id"), col("text"), col("blk"),
        uniqTexts = false, shingleN = 3)
      .select("doc_a", "doc_b")
    val pairs = Dedup.verifyJaccard(s, blk, cands, minJac = 0.9)
      .select("doc_a", "doc_b")
    val clusters = Dedup.dupClusters(pairs)
    base.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .select("doc_id", "lang_pred", "n_tokens")
      // sampled-sort cut (r21): without it the final range exchange's
      // bounds sampling re-ran the whole minhash+verify+cluster subtree
      .localCheckpoint(eager = false)
      .orderBy("doc_id")
  }

  /** The COMPLETE hygiene chain over an arbitrary corpus — quality →
    * repetition → language → exact dedup → near-dup — with every stage
    * oracle-expressible (unlike [[curate]], whose MinHash near-dup stage
    * hashes with xxhash64 and gets a rows-only check):
    *
    *  1. quality gate: `n_tokens ≥ 5`;
    *  2. repetition gate (the Gopher-style filters, same kernels as
    *     [[Curation.repetitionSignals]]): share of the most frequent
    *     token ≤ `maxTopTokFrac`, share of duplicate 2-gram occurrences
    *     ≤ `maxDup2gramFrac` — both per-row native expressions, zero
    *     shuffle;
    *  3. language gate: `lang_pred ≠ "und"`;
    *  4. exact dedup: keep the smallest doc id per md5 fingerprint;
    *  5. near-dup: a survivor is dropped iff it has a ≥ `minJac`
    *     3-shingle-Jaccard partner with a SMALLER doc id in its
    *     (lang, length-bucket) block — [[Dedup.jaccardPairs]]'s
    *     inverted-index join, never all-pairs. This keep-smallest rule is
    *     deliberately non-transitive so DuckDB can check it without
    *     recursion; the transitive-closure variant is [[curate]].
    *
    * `docs` needs (doc_id, text, lang, n_chars) — lang/n_chars only feed
    * the near-dup blocking key. Stages 1-4 are one narrow codegen'd scan
    * + one window shuffle; stage 5's shuffle is keyed by (block, shingle
    * hash). The survivor set checkpoints before fanning into the pair
    * self-join and the final anti-join (ids + scalars only — the text
    * rides in from `docs` by id). */
  def curateFullOn(docs: DataFrame, maxTopTokFrac: Double = 0.2,
      maxDup2gramFrac: Double = 0.1, minJac: Double = 0.9): DataFrame = {
    val s = docs.sparkSession
    import graft.functions.TextExpressions
    val nGrams = when(col("n_tokens") < 2, lit(1L)).otherwise(col("n_tokens") - 1L)
    val scored = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("lang_pred", langIdPredict(col("toks")))
      .withColumn("top_tok_frac",
        TextExpressions.topTokenCount(s, col("toks")).cast("double")
          / col("n_tokens").cast("double"))
      .withColumn("dup_2gram_frac",
        (nGrams - size(TextExpressions.shingleHashes(s, col("toks"), 2)).cast("long"))
          .cast("double") / nGrams.cast("double"))
    val gated = scored.filter(
      col("n_tokens") >= 5 &&
        col("top_tok_frac") <= maxTopTokFrac &&
        col("dup_2gram_frac") <= maxDup2gramFrac &&
        col("lang_pred") =!= "und")
    val w = Window.partitionBy("fp").orderBy(asc("doc_id"))
    val kept = gated
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang_pred", "n_tokens", "top_tok_frac", "dup_2gram_frac")
      .localCheckpoint()
    val blk = docs
      .join(kept.select("doc_id"), "doc_id") // only survivors are shingled
      .withColumn("blk", concat_ws("_", col("lang"), expr("n_chars DIV 100")))
    val dropped = Dedup.jaccardPairs(blk, col("doc_id"), col("text"), col("blk"))
      .filter(col("jac") >= minJac)
      .select(col("doc_b").as("doc_id")).distinct()
    kept.join(dropped, Seq("doc_id"), "left_anti")
      // NO sampled-sort cut (r21 A/B: `dropped` sits behind the shingle
      // join's exchanges, which AQE sampling re-reads as materialized
      // stages — the cut regressed pipeline_curate_excise 3.38 → 3.93 s
      // isolated, so it was reverted on evidence)
      .orderBy("doc_id")
  }

  def curateFull(s: SparkSession, d: String): DataFrame =
    curateFullOn(Tables.documents(s, d))

  /** The full chain over the SPAN-EXCISED corpus — production order for
    * a crawl: cut cross-document boilerplate passages first
    * ([[Dedup.spanExciseOn]]), then quality/repetition/language gates and
    * doc-level dedup judge the text that would actually be trained on.
    * A page that is boilerplate + one good paragraph can pass here and
    * be dropped by [[curateFull]] (or vice versa: its repetition gate
    * may only clear AFTER the pasted block is gone). Same gate
    * definitions, different corpus — both sides share one
    * implementation (Scala: [[curateFullOn]]; SQL: the parameterized
    * CTE pyramid). */
  def curateExcise(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cleaned = docs.select(col("doc_id"), col("lang"))
      .join(Dedup.spanExciseOn(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), col("clean_text")), "doc_id")
      .select(col("doc_id"), col("clean_text").as("text"), col("lang"),
        length(col("clean_text")).cast("long").as("n_chars"))
      // [[curateFullOn]] reads its corpus TWICE (the gate chain and the
      // near-dup block join) — for the plain corpus that is two parquet
      // scans, but here the corpus is the span-excision subtree
      // (positional gram semi-joins over every document), so the uncut
      // plan paid the excision twice per run (r20 A/B at sf0.1:
      // 6.55 → 4.45 s). Lazy cut, values unchanged.
      .localCheckpoint(eager = false)
    curateFullOn(cleaned)
  }

  /** INCREMENTAL curation — the daily-increment flow the reference runs
    * as its update scripts (`update_label_paths.py`,
    * `update_elasticsearch_with_segments.py`: new data arrives, is
    * cleaned, and merged against what the store already holds):
    * `incoming` goes through the same quality/repetition/language gates
    * and keep-first exact dedup as [[curateFullOn]] stages 1-4, then
    * drops anything whose content fingerprint ALREADY EXISTS in the
    * curated table — an anti-join on the 16-byte md5, so the existing
    * corpus contributes only its fingerprint column (never rescanned
    * text, never reshuffled by content). At lake scale `existingFp` is a
    * stored column of the curated table; the shuffle is keyed by the
    * digest, O(increment + |fp table|). Near-dup against the EXISTING
    * corpus is deliberately out of scope here (that is a full
    * [[Dedup.minhashPairs]] run over both sets — the periodic compaction
    * pass, not the per-increment one); within the increment the gates
    * mirror the batch chain exactly. */
  def curateIncrementalOn(incoming: DataFrame, existingFp: DataFrame,
      maxTopTokFrac: Double = 0.2, maxDup2gramFrac: Double = 0.1): DataFrame = {
    val s = incoming.sparkSession
    import graft.functions.TextExpressions
    val nGrams = when(col("n_tokens") < 2, lit(1L)).otherwise(col("n_tokens") - 1L)
    val scored = incoming
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("lang_pred", langIdPredict(col("toks")))
      .withColumn("top_tok_frac",
        TextExpressions.topTokenCount(s, col("toks")).cast("double")
          / col("n_tokens").cast("double"))
      .withColumn("dup_2gram_frac",
        (nGrams - size(TextExpressions.shingleHashes(s, col("toks"), 2)).cast("long"))
          .cast("double") / nGrams.cast("double"))
    val gated = scored.filter(
      col("n_tokens") >= 5 &&
        col("top_tok_frac") <= maxTopTokFrac &&
        col("dup_2gram_frac") <= maxDup2gramFrac &&
        col("lang_pred") =!= "und")
    val w = Window.partitionBy("fp").orderBy(asc("doc_id"))
    gated
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(existingFp.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .select("doc_id", "lang_pred", "n_tokens")
      .orderBy("doc_id")
  }

  /** Binding: docs with `doc_id % 4 = 0` play the arriving increment;
    * the rest are "yesterday's" curated corpus contributing fingerprints. */
  def curateIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    curateIncrementalOn(
      docs.filter(col("doc_id") % 4 === 0),
      docs.filter(col("doc_id") % 4 =!= 0)
        .select(exactFingerprint(col("text")).as("fp")))
  }

  /** Gopher-gated curation — the published pipeline's own order (the
    * Gopher/MassiveText flow: quality+repetition RULES first, exact
    * dedup over the admitted set): the
    * [[TextAnalysis.gopherQualityOn]] verdict is the admission stage
    * (one fused-kernel map over the corpus scan — no shuffle), then
    * keep-first md5 dedup among survivors. The rules gate BEFORE the
    * dedup shuffle on purpose: at crawl scale most of the corpus fails
    * the rules, so the fingerprint exchange moves only the admitted
    * minority — the same stage-ordering argument [[curateFullOn]]
    * documents for its cheap gates. Survivors carry the headline rule
    * metrics for downstream mixing/audit. */
  def curateGopherOn(docs: DataFrame): DataFrame = {
    val admitted = TextAnalysis.gopherQualityOn(docs, col("doc_id"), col("text"),
        stopwords = graft.functions.TextFunctions.EnglishStopwords)
      .filter(col("passes"))
      .select("doc_id", "n_words", "top2_frac", "dup5_frac")
    val w = Window.partitionBy("fp").orderBy(asc("doc_id"))
    docs.select(col("doc_id"), col("text"))
      .join(admitted, "doc_id")
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "n_words", "top2_frac", "dup5_frac")
      // sampled-sort cut (r21): the bounds sampling re-ran the gopher
      // kernel + fingerprint window otherwise
      .localCheckpoint(eager = false)
      .orderBy("doc_id")
  }

  def curateGopher(s: SparkSession, d: String): DataFrame =
    curateGopherOn(Tables.documents(s, d))

  /** A14 — the per-stage RUNNING COUNTERS surfaced as an oracle-checked
    * relation: run ONE action over [[curateExactObserved]]'s plan, read
    * the Observation accumulators (which folded into that same job —
    * zero extra scans), and emit the funnel as (stage, n_rows). The
    * oracle recomputes each stage's cardinality declaratively, so the
    * accumulator plumbing itself — placement above the sort, exactly-
    * once firing — is what's under test. */
  def curateCountersQ(s: SparkSession, d: String): DataFrame = {
    val (kept, obs) = curateExactObserved(s, d)
    kept.foreach(_ => ()) // the single action that fires the observations
    import s.implicits._
    obs.map(o => (o.name, o.get("rows").asInstanceOf[Number].longValue()))
      .toDF("stage", "n_rows").orderBy("stage")
  }

  /** Documents → trainer sequences, composed in one lineage: token-window
    * chunking ([[TextAnalysis.chunkOn]], lineage-keeping) feeding the
    * hierarchical-prefix-sum packer ([[Curation.packSequences]]) — the
    * transform a pretraining data loader actually materializes. The
    * chunk key `doc_id·10 + chunk_id` (chunk counts are < 10 at this
    * window over ≤120-token docs) keeps the pack order deterministic and
    * SQL-replayable. The <10 assumption is ENFORCED per-row: a longer
    * doc would collide keys and make the pack assignment's cumulative
    * ORDER BY tie-ambiguous, so it must fail loudly (`raise_error`, zero
    * extra jobs), not silently diverge from the oracle. */
  /** `doc_id·10 + chunk_id` with the <10-chunks assumption enforced
    * per-row (`raise_error` — zero extra jobs): a colliding key would
    * make the pack window's ORDER BY tie-ambiguous and the pack
    * assignment nondeterministic, so a longer-doc corpus must fail
    * loudly, not silently diverge from the oracle. */
  private def guardedChunkKey: org.apache.spark.sql.Column =
    when(col("chunk_id") >= 10, raise_error(concat(
      lit("chunk key: chunk_id "), col("chunk_id"),
      lit(" >= 10 for doc_id "), col("doc_id"),
      lit(" — doc_id*10+chunk_id keys would collide; widen the key"))))
      .otherwise(col("doc_id") * 10 + col("chunk_id"))

  def chunkPack(s: SparkSession, d: String): DataFrame = {
    val chunks = TextAnalysis.chunkOn(Tables.documents(s, d),
        col("doc_id"), col("text"), window = 16, stride = 12)
      .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .withColumn("chunk_key", guardedChunkKey)
    Curation.packSequences(chunks, col("source"), col("chunk_key"),
        col("n_chunk_tokens"), budget = 512L)
      .select(col("doc_id"), col("chunk_id"), col("source"),
        col("n_chunk_tokens"), col("pack_id"), col("pack_offset"))
      .orderBy("doc_id", "chunk_id")
  }

  /** The GOLDEN PATH: raw corpus → training batches in ONE lineage —
    * the end-to-end export an LLM-data pipeline ultimately materializes,
    * composed entirely from already-proven stages:
    *
    *   1. curate ([[curateExact]]): quality gate + language gate + exact
    *      dedup keep-first;
    *   2. mixture controls on the CURATED DOCUMENTS —
    *      [[Curation.temperatureSample]] (sqrt-flattened language mix
    *      over `lang_pred`, deterministic md5 membership) then
    *      [[Curation.capPerGroup]] (≤15 docs per source — bounds any one
    *      crawl's share);
    *   3. [[TextAnalysis.chunkOn]] (window 16 / stride 12) over the
    *      surviving docs' text;
    *   4. [[Curation.packSequences]] into 512-token training packs,
    *      per-source shards, deterministic chunk order.
    *
    * Mixture controls run at DOC granularity BEFORE chunking — sampling
    * or capping after packing would drop chunks out of already-assigned
    * packs (holes in the training batches) and break doc atomicity in
    * the mix; packing is the last physical-layout pass, as in a real
    * loader. Every stage is oracle-expressible, so the WHOLE lineage is
    * hash-checked end to end: the DuckDB replay is the concatenation of
    * the stage CTE pyramids that already check each piece. One narrow
    * scan + one fingerprint window + two doc-level window shuffles +
    * the bucketed pack prefix-sum — nothing corpus×corpus, every
    * shuffle keyed (fp, lang_pred, source, (source,bucket)). */
  def exportPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // unsorted survivors (r21): the old curateExact base carried a
    // presentation sort no downstream stage needed — and paid that range
    // exchange's child-sampling double execution inside the export
    val kept = curateExactUnsorted(s, d)
    // temperatureSample reads its input TWICE (per-language counts +
    // admit join) — cut, or the curate gate pyramid runs twice (r21)
    val withSrc = kept.join(docs.select("doc_id", "source"), "doc_id")
      .localCheckpoint(eager = false)
    val sampled = Curation.temperatureSample(
      withSrc, col("lang_pred"), col("doc_id"), alpha = 0.5)
    // stage boundary: the curated/sampled/capped doc set feeds BOTH the
    // chunker's corpus filter and the lineage join below — checkpoint it
    // once or the whole gate pyramid executes twice (measured 7.4s →
    // 2.7s at sf0.1; production writes the curated table here anyway)
    val capped = Curation.capPerGroup(
        sampled, col("source"), col("doc_id"), n = 15).drop("rn")
      .select("doc_id", "source", "lang_pred").localCheckpoint()
    val chunks = TextAnalysis.chunkOn(
        docs.join(capped.select("doc_id"), "doc_id"),
        col("doc_id"), col("text"), window = 16, stride = 12)
      .join(capped, "doc_id")
      .withColumn("chunk_key", guardedChunkKey)
    Curation.packSequences(chunks, col("source"), col("chunk_key"),
        col("n_chunk_tokens"), budget = 512L)
      .select(col("doc_id"), col("chunk_id"), col("source"),
        col("lang_pred"), col("n_chunk_tokens"), col("pack_id"),
        col("pack_offset"))
      .orderBy("doc_id", "chunk_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_export" -> exportPipeline,
    "pipeline_curate_exact" -> curateExact,
    "pipeline_curate_counters" -> curateCountersQ,
    "pipeline_curate" -> curate,
    "pipeline_curate_full" -> curateFull,
    "pipeline_curate_excise" -> curateExcise,
    "pipeline_curate_incr" -> curateIncremental,
    "pipeline_gopher" -> curateGopher,
    "pipeline_chunk_pack" -> chunkPack)

  /** Shared DuckDB CTE prefix `t,h,b,lp,g`: tokenize → langid hits →
    * best marker → lang_pred/n_tokens → quality gate (mirrors
    * [[curateExact]]'s stages). */
  private lazy val langGateCtes: String = {
    val hits = LangMarkers.map { case (l, m) =>
      s"len(list_filter(list_distinct(toks), x -> list_contains([${m.map(x => s"'$x'").mkString(", ")}], x))) AS h_$l"
    }.mkString(", ")
    val best = LangMarkers.map { case (l, _) => s"h_$l" }.mkString("greatest(", ", ", ")")
    val cases = LangMarkers.map { case (l, _) =>
      s"WHEN h_$l = best AND best > 0 THEN '$l'"
    }.mkString(" ")
    s"""t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
       h AS (SELECT doc_id, text, toks, $hits FROM t),
       b AS (SELECT *, $best AS best FROM h),
       lp AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE $cases ELSE 'und' END AS lang_pred
         FROM b),
       g AS (SELECT * FROM lp WHERE n_tokens >= 5 AND lang_pred <> 'und')"""
  }

  val oracleSql: Map[String, String] = Map(
    // Gopher rules (TextAnalysis.gopherSql — the same CTE pyramid that
    // checks txt_gopher_quality alone) → keep-first md5 dedup
    "pipeline_gopher" ->
      s"""WITH q AS (${TextAnalysis.gopherSql}),
         f AS (SELECT doc_id FROM (
             SELECT d.doc_id, row_number() OVER (
               PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rn
             FROM documents d JOIN q ON d.doc_id = q.doc_id AND q.passes)
           WHERE rn = 1)
         SELECT q.doc_id, q.n_words, q.top2_frac, q.dup5_frac
         FROM q JOIN f USING (doc_id) ORDER BY q.doc_id""",
    // the golden path end to end: the curate-exact pyramid → temperature
    // sample (md5 uniform) → per-source cap → chunk window/stride replay
    // → pack cumulative window — each block is the CTE chain that
    // already checks its stage alone
    "pipeline_export" ->
      s"""WITH $langGateCtes,
         r AS (SELECT doc_id, lang_pred, n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM g),
         surv AS (SELECT r.doc_id, r.lang_pred, d.source
           FROM r JOIN documents d USING (doc_id) WHERE rn = 1),
         c AS (SELECT lang_pred, count(*) AS c FROM surv GROUP BY lang_pred),
         m AS (SELECT min(c) AS cmin FROM c),
         f AS (SELECT lang_pred,
             sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE)) AS f FROM c, m),
         u AS (SELECT doc_id, lang_pred, source, ${Curation.hexUSql} AS uu
           FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                 FROM surv)),
         samp AS (SELECT u.doc_id, u.lang_pred, u.source
           FROM u JOIN f USING (lang_pred)
           WHERE CAST(uu AS DOUBLE) / 4294967296.0 < f),
         cap AS (SELECT doc_id, lang_pred, source FROM (
             SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn2
             FROM samp) WHERE rn2 <= 15),
         t2 AS (SELECT d.doc_id,
             string_split(lower(coalesce(d.text, '')), ' ') AS toks
           FROM documents d JOIN cap USING (doc_id)),
         d2 AS (SELECT doc_id, toks,
           CASE WHEN len(toks) <= 16 THEN 1
             ELSE CAST(ceil(CAST(len(toks) - 16 AS DOUBLE) / 12) AS BIGINT) + 1
           END AS n_chunks FROM t2),
         e2 AS (SELECT doc_id, toks,
             CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_id FROM d2),
         ch AS (SELECT doc_id, chunk_id,
             CAST(len(toks[chunk_id*12 + 1 : chunk_id*12 + 16]) AS BIGINT) AS n_chunk_tokens
           FROM e2),
         tc2 AS (SELECT ch.doc_id, ch.chunk_id, cap.source, cap.lang_pred,
             ch.n_chunk_tokens, ch.doc_id * 10 + ch.chunk_id AS ck
           FROM ch JOIN cap USING (doc_id)),
         cm AS (SELECT *, COALESCE(SUM(n_chunk_tokens) OVER (
             PARTITION BY source ORDER BY ck
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           FROM tc2)
         SELECT doc_id, chunk_id, source, lang_pred, n_chunk_tokens,
           CAST(cum // 512 AS BIGINT) AS pack_id,
           CAST(cum % 512 AS BIGINT) AS pack_offset
         FROM cm ORDER BY doc_id, chunk_id""",
    // chunk→pack: the txt_chunk window/stride replay feeding the
    // pack_sequences cumulative window, keyed by the same deterministic
    // chunk key the Spark side buckets on
    "pipeline_chunk_pack" ->
      """WITH t AS (SELECT doc_id,
           string_split(lower(coalesce(text, '')), ' ') AS toks FROM documents),
         d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_doc_tokens,
           CASE WHEN len(toks) <= 16 THEN 1
             ELSE CAST(ceil(CAST(len(toks) - 16 AS DOUBLE) / 12) AS BIGINT) + 1
           END AS n_chunks FROM t),
         e AS (SELECT doc_id, toks,
             CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_id FROM d),
         ch AS (SELECT doc_id, chunk_id,
             CAST(len(toks[chunk_id*12 + 1 : chunk_id*12 + 16]) AS BIGINT) AS n_chunk_tokens
           FROM e),
         tc AS (SELECT ch.doc_id, ch.chunk_id, doc.source, ch.n_chunk_tokens,
             ch.doc_id * 10 + ch.chunk_id AS ck
           FROM ch JOIN documents doc ON ch.doc_id = doc.doc_id),
         c AS (SELECT *, COALESCE(SUM(n_chunk_tokens) OVER (
             PARTITION BY source ORDER BY ck
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           FROM tc)
         SELECT doc_id, chunk_id, source, n_chunk_tokens,
           CAST(cum // 512 AS BIGINT) AS pack_id,
           CAST(cum % 512 AS BIGINT) AS pack_offset
         FROM c ORDER BY doc_id, chunk_id""",
    // [[curate]]: exact-dedup survivors minus non-representatives of the
    // transitive ≥0.9 3-shingle-Jaccard closure. The Spark side proposes
    // pairs with MinHash banding and VERIFIES with exact Jaccard, so the
    // oracle needs no hash function — all in-block pairs + recursive
    // reachability recompute the identical answer.
    "pipeline_curate" ->
      s"""WITH RECURSIVE $langGateCtes,
         r AS (SELECT doc_id, lang_pred, n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM g),
         surv AS (SELECT doc_id, lang_pred, n_tokens FROM r WHERE rn = 1),
         st AS (SELECT d.doc_id, d.lang || '_' || (d.n_chars // 100) AS blk,
             string_split(lower(d.text), ' ') AS toks
           FROM documents d JOIN surv USING (doc_id)),
         sh AS (SELECT doc_id, blk, list_distinct(${Dedup.shSql}) AS sh FROM st),
         rawpair AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
             len(a.sh) AS na, len(b.sh) AS nb
           FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id),
         pair AS (SELECT doc_a, doc_b FROM rawpair
           WHERE CAST(inter AS DOUBLE)
             / nullif(CAST(na + nb - inter AS DOUBLE), 0.0) >= 0.9),
         edge AS (SELECT doc_a AS a, doc_b AS b FROM pair
           UNION SELECT doc_b, doc_a FROM pair
           UNION SELECT doc_a, doc_a FROM pair
           UNION SELECT doc_b, doc_b FROM pair),
         reach(a, b) AS (SELECT a, b FROM edge
           UNION SELECT x.a, e.b FROM reach x JOIN edge e ON x.b = e.a),
         cl AS (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a)
         SELECT s.doc_id, s.lang_pred, s.n_tokens FROM surv s
         LEFT JOIN cl USING (doc_id)
         WHERE cl.cluster IS NULL OR cl.cluster = s.doc_id
         ORDER BY s.doc_id""",
    "pipeline_curate_exact" ->
      s"""WITH $langGateCtes,
         r AS (SELECT doc_id, lang_pred, n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM g)
         SELECT doc_id, lang_pred, n_tokens FROM r WHERE rn = 1 ORDER BY doc_id""",
    "pipeline_curate_counters" ->
      s"""WITH $langGateCtes
         SELECT stage, n_rows FROM (
           SELECT 'scanned' AS stage, count(*) AS n_rows FROM documents
           UNION ALL
           SELECT 'quality_gated', count(*) FROM g
           UNION ALL
           SELECT 'exact_kept', count(DISTINCT md5(text)) FROM g)
         ORDER BY stage""",
    "pipeline_curate_full" ->
      curateFullSqlFrom("src AS (SELECT doc_id, text, lang, n_chars FROM documents)"),
    "pipeline_curate_excise" -> {
      // span-excision CTEs (the dedup_span_excise policy) producing the
      // cleaned corpus `src` the shared full-chain CTEs then gate
      val excise =
        """xt AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
               string_split(text, ' ') AS raw FROM documents),
           xg AS (SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS gram
                  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS pos
                        FROM xt WHERE len(toks) >= 8)),
           xown AS (SELECT gram, min(doc_id) AS owner FROM xg
                    GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
           xexc AS (SELECT DISTINCT doc_id, p
                    FROM (SELECT xg.doc_id, unnest(range(pos, pos + 8)) AS p
                          FROM xg JOIN xown USING (gram) WHERE xg.doc_id <> xown.owner)),
           xexcl AS (SELECT doc_id, array_agg(p) AS ps FROM xexc GROUP BY doc_id),
           src0 AS (SELECT xt.doc_id, lang,
               coalesce(array_to_string(list_transform(
                 list_filter(range(1, len(toks) + 1),
                   i -> ps IS NULL OR NOT list_contains(ps, i)),
                 i -> raw[i]), ' '), '') AS text
             FROM xt LEFT JOIN xexcl USING (doc_id)),
           src AS (SELECT doc_id, text, lang,
               CAST(length(text) AS BIGINT) AS n_chars FROM src0)"""
      curateFullSqlFrom(excise)
    }) ++ extraOracles

  /** The full-chain CTE pyramid parameterized by its corpus source: a
    * CTE chain whose last relation must be `src(doc_id, text, lang,
    * n_chars)`. `pipeline_curate_full` binds it to raw `documents`;
    * `pipeline_curate_excise` binds it to the span-excised corpus — ONE
    * definition of the gates, two corpora, like the Scala side's
    * [[curateFullOn]]. */
  private def curateFullSqlFrom(sourceCtes: String): String = {
      val hits = LangMarkers.map { case (l, m) =>
        s"len(list_filter(list_distinct(toks), x -> list_contains([${m.map(x => s"'$x'").mkString(", ")}], x))) AS h_$l"
      }.mkString(", ")
      val best = LangMarkers.map { case (l, _) => s"h_$l" }.mkString("greatest(", ", ", ")")
      val cases = LangMarkers.map { case (l, _) =>
        s"WHEN h_$l = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      // word 2-grams (whole text when < 2 tokens) and 3-shingles (whole
      // text when < 3 tokens) — mirror TextFunctions.shingles semantics
      val grams2 =
        """CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
           ELSE list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' ')) END"""
      val sh3 =
        """CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END"""
      s"""WITH $sourceCtes,
         t AS (SELECT doc_id, text, lang, n_chars,
             string_split(lower(text), ' ') AS toks FROM src),
         h AS (SELECT *, $hits FROM t),
         b AS (SELECT *, $best AS best FROM h),
         lp AS (SELECT doc_id, text, lang, n_chars, toks,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE $cases ELSE 'und' END AS lang_pred
           FROM b),
         tc AS (SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(toks) AS tok FROM lp) GROUP BY doc_id, tok),
         ta AS (SELECT doc_id, max(c) AS top_c FROM tc GROUP BY doc_id),
         gc AS (SELECT doc_id, g, count(*) AS c
                FROM (SELECT doc_id, unnest($grams2) AS g FROM lp) GROUP BY doc_id, g),
         ga AS (SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct FROM gc GROUP BY doc_id),
         rep AS (SELECT lp.*,
             CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_tok_frac,
             CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_2gram_frac
           FROM lp JOIN ta USING (doc_id) JOIN ga USING (doc_id)),
         g AS (SELECT * FROM rep
           WHERE n_tokens >= 5 AND top_tok_frac <= 0.2
             AND dup_2gram_frac <= 0.1 AND lang_pred <> 'und'),
         r AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM g),
         k AS (SELECT * FROM r WHERE rn = 1),
         sh AS (SELECT doc_id, lang || '_' || (n_chars // 100) AS blk,
             list_distinct($sh3) AS sh FROM k),
         pair AS (SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             len(list_filter(a.sh, x -> list_contains(b2.sh, x))) AS inter,
             len(a.sh) AS na, len(b2.sh) AS nb
           FROM sh a JOIN sh b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id),
         drp AS (SELECT DISTINCT doc_b AS doc_id FROM pair
           WHERE inter > 0
             AND CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.9)
         SELECT doc_id, lang_pred, n_tokens, top_tok_frac, dup_2gram_frac FROM k
         WHERE doc_id NOT IN (SELECT doc_id FROM drp)
         ORDER BY doc_id"""
  }

  private lazy val extraOracles: Map[String, String] = Map(
    "pipeline_curate_incr" -> {
      val hits = LangMarkers.map { case (l, m) =>
        s"len(list_filter(list_distinct(toks), x -> list_contains([${m.map(x => s"'$x'").mkString(", ")}], x))) AS h_$l"
      }.mkString(", ")
      val best = LangMarkers.map { case (l, _) => s"h_$l" }.mkString("greatest(", ", ", ")")
      val cases = LangMarkers.map { case (l, _) =>
        s"WHEN h_$l = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      val grams2 =
        """CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
           ELSE list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' ')) END"""
      s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
             FROM documents WHERE doc_id % 4 = 0),
         ex AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 4 <> 0),
         h AS (SELECT *, $hits FROM t),
         b AS (SELECT *, $best AS best FROM h),
         lp AS (SELECT doc_id, text, toks,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE $cases ELSE 'und' END AS lang_pred
           FROM b),
         tc AS (SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(toks) AS tok FROM lp) GROUP BY doc_id, tok),
         ta AS (SELECT doc_id, max(c) AS top_c FROM tc GROUP BY doc_id),
         gc AS (SELECT doc_id, g, count(*) AS c
                FROM (SELECT doc_id, unnest($grams2) AS g FROM lp) GROUP BY doc_id, g),
         ga AS (SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct FROM gc GROUP BY doc_id),
         rep AS (SELECT lp.*,
             CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_tok_frac,
             CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_2gram_frac
           FROM lp JOIN ta USING (doc_id) JOIN ga USING (doc_id)),
         g AS (SELECT * FROM rep
           WHERE n_tokens >= 5 AND top_tok_frac <= 0.2
             AND dup_2gram_frac <= 0.1 AND lang_pred <> 'und'),
         r AS (SELECT *, md5(text) AS fp,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM g)
         SELECT doc_id, lang_pred, n_tokens FROM r
         WHERE rn = 1 AND fp NOT IN (SELECT fp FROM ex)
         ORDER BY doc_id"""
    })
}
