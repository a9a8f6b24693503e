package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Model-based data selection — the two standard ML-driven curation
  * stages of an LLM training-data pipeline, beyond the heuristic gates
  * in [[Curation]]/[[Pipelines]]:
  *
  *  - '''Quality classification''' ([[qualityNb]]): a multinomial
  *    Naive-Bayes token model trained on a weakly-labeled split and
  *    applied to every document — the distributed shape of
  *    fastText-style quality filters (as used by CCNet / DCLM /
  *    FineWeb-Edu): linear bag-of-words scoring, which NB is.
  *  - '''Importance resampling''' ([[dsirSelect]]): DSIR (Xie et al.,
  *    NeurIPS 2023) — hashed-n-gram importance weights between a target
  *    and the raw distribution, Gumbel-top-k selection.
  *
  * Both are END-TO-END relational: training IS an aggregation (class ×
  * token counts), scoring IS a join + sum, so the whole train→apply
  * lineage runs as one Catalyst plan — no driver-side model state, no
  * UDFs — and replays exactly in the DuckDB oracle.
  *
  * Determinism discipline: every per-document score is a sum of
  * FIXED-POINT log-ratios (`round(llr · 10⁶)` as long). Integer sums are
  * associative/commutative, so the result is independent of partitioning
  * and aggregation order — bit-exact across Spark plan changes AND
  * against the oracle — where a double sum would drift per run. The
  * model's smoothed log-ratios live at 1e-6 resolution, far below any
  * decision margin that matters.
  *
  * Scale: token/bucket count tables are vocabulary-sized (≪ corpus);
  * the score join shuffles on the term key and AQE broadcast-converts
  * it when the model fits — at 100 TB a 100M-term model stays a
  * shuffle join, everything else is map-side. No driver collect
  * anywhere.
  */
object Classify {

  /** Deterministic holdout membership: first hex char of md5(id) in
    * 0..7 → the stable "train half". Membership is a pure function of
    * the document id, so it survives corpus growth, repartitioning, and
    * re-runs — the property a PRNG split lacks (SURVEY §7.4). */
  private[operators] def isTrain(id: Column): Column =
    graft.functions.HashFunctions.md5Bucket16(id) < "8"

  /** round(x · 10⁶) as long — the fixed-point quantizer shared by every
    * score path in this file (and the oracle's
    * `CAST(round(x * 1000000) AS BIGINT)`). */
  private def fx(c: Column): Column = round(c * lit(1e6)).cast("long")

  // --- multinomial Naive Bayes --------------------------------------------

  /** Train: per-term fixed-point log-likelihood ratios with Laplace
    * add-1 smoothing, plus the model scalars (unseen-term ratio, class
    * prior) as a one-row frame. `isPos` is the weak label (heuristic
    * labels → generalizing classifier, the standard bootstrap).
    *
    * Returns (llr: (term, llr_fx), scalars: (__ufx, __pfx)). */
  def nbModel(train: DataFrame, text: Column, isPos: Column)
      : (DataFrame, DataFrame) = {
    val (counts, docsN) = nbCounts(train, text, isPos)
    nbModelFromCounts(counts, docsN)
  }

  /** The model's SUFFICIENT STATISTICS: per-term class counts
    * (term, __cp, __cn) and class doc counts (__np, __nn). Pure sums →
    * ADDITIVE: counts of a union = per-key sums of per-part counts,
    * which is what makes the model incrementally maintainable
    * ([[nbCountsMerge]]) — the add-vs-train split costs nothing here
    * because NB "training" IS aggregation. */
  def nbCounts(train: DataFrame, text: Column, isPos: Column)
      : (DataFrame, DataFrame) = {
    val tok = train.select(isPos.as("__pos"), explode(tokens(text)).as("term"))
    val counts = tok.groupBy("term").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("__cn"))
    val docsN = train.agg(
      sum(when(isPos, 1L).otherwise(0L)).as("__np"),
      sum(when(!isPos, 1L).otherwise(0L)).as("__nn"))
    (counts, docsN)
  }

  /** Merge two count states (full outer on term; doc counts add) —
    * exactly the merge a streaming ingest applies per micro-batch. */
  def nbCountsMerge(a: (DataFrame, DataFrame), b: (DataFrame, DataFrame))
      : (DataFrame, DataFrame) = {
    def z(c: Column) = coalesce(c, lit(0L))
    val counts = a._1.withColumnRenamed("__cp", "__ap")
      .withColumnRenamed("__cn", "__an")
      .join(b._1.withColumnRenamed("__cp", "__bp")
        .withColumnRenamed("__cn", "__bn"), Seq("term"), "full_outer")
      .select(col("term"), (z(col("__ap")) + z(col("__bp"))).as("__cp"),
        (z(col("__an")) + z(col("__bn"))).as("__cn"))
    // an EMPTY side's doc counts are NULL (sum over zero rows), and
    // NULL + n = NULL would poison the merged state durably (the
    // at-rest store then raise_errors forever) — coalesce BOTH sides,
    // exactly like the term-count merge above
    val docsN = a._2.crossJoin(
        b._2.withColumnRenamed("__np", "__np2").withColumnRenamed("__nn", "__nn2"))
      .select((z(col("__np")) + z(col("__np2"))).as("__np"),
        (z(col("__nn")) + z(col("__nn2"))).as("__nn"))
    (counts, docsN)
  }

  /** Counts → smoothed fixed-point model (the deterministic "finalize"
    * step, shared by fresh train and incremental refresh). */
  def nbModelFromCounts(counts: DataFrame, docsN: DataFrame)
      : (DataFrame, DataFrame) = {
    // totals: class token masses + vocabulary size V (distinct train
    // terms) — the smoothing denominators
    val totals = counts
      .agg(sum("__cp").as("__tp"), sum("__cn").as("__tn"),
        count(lit(1)).as("__v"))
      .crossJoin(docsN)
    def smoothed(c: Column, t: Column): Column =
      log((c + lit(1L)).cast("double") / (t + col("__v")).cast("double"))
    // single-class (or empty) training data has no likelihood ratio to
    // learn — Spark's log(0) would return NULL and every margin would
    // silently null out; fail loudly instead (the Sketches certification
    // discipline). The guard must sit INSIDE each output expression, not
    // on a side column: Catalyst prunes unreferenced columns, so a guard
    // carried next to llr_fx would be optimized away and llr-only
    // consumers (qualityNbModelQ) would silently get a degenerate model.
    val oneClass =
      col("__np").isNull || col("__np") === 0L || col("__nn") === 0L
    def bothClassesOr(v: Column): Column =
      when(oneClass,
        raise_error(concat(lit("nbModel: training data must contain both"
          + " classes; got np="), col("__np"), lit(" nn="), col("__nn")))
          .cast("long"))
        .otherwise(v)
    val llr = counts.crossJoin(broadcast(totals)).select(col("term"),
      bothClassesOr(fx(smoothed(col("__cp"), col("__tp"))
        - smoothed(col("__cn"), col("__tn")))).as("llr_fx"))
    val scalars = totals.select(
      bothClassesOr(
        fx(log(lit(1.0) / (col("__tp") + col("__v")).cast("double"))
          - log(lit(1.0) / (col("__tn") + col("__v")).cast("double")))).as("__ufx"),
      bothClassesOr(
        fx(log(col("__np").cast("double"))
          - log(col("__nn").cast("double")))).as("__pfx"))
    (llr, scalars)
  }

  /** Apply: per-document margin = prior + Σ llr(term) over the token
    * MULTISET (multiplicity counts, as multinomial NB demands); terms
    * outside the train vocabulary score the smoothed-unseen constant.
    * One explode + one term-keyed join + one integer-sum aggregate. */
  def nbScore(docs: DataFrame, id: Column, text: Column,
      llr: DataFrame, scalars: DataFrame): DataFrame =
    nbScoreRaw(docs, id, text, llr, scalars)
      .select(col("doc_id"), col("n_tokens"),
        (col("__mfx").cast("double") / lit(1e6)).as("nb_margin"),
        (col("__mfx") > 0L).as("pred_pos"))

  /** [[nbScore]] keeping the fixed-point margin — the integer-exact form
    * calibration bucketing needs (`__mfx` bucket arithmetic must stay in
    * longs to replay bit-for-bit). */
  private[operators] def nbScoreRaw(docs: DataFrame, id: Column,
      text: Column, llr: DataFrame, scalars: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .join(llr, Seq("term"), "left") // AQE broadcast-converts small models
      .crossJoin(broadcast(scalars))
      .groupBy("doc_id")
      .agg((sum(coalesce(col("llr_fx"), col("__ufx"))) + max(col("__pfx")))
          .as("__mfx"),
        count(lit(1)).as("n_tokens"))

  /** Calibration / reliability table over the held-out split — the eval
    * face a threshold-picker actually reads: margins bucketed into 8
    * equal-width bins (integer fixed-point arithmetic end to end, so
    * the binning replays bit-for-bit), observed positive rate and mean
    * margin per bin. A well-calibrated gate shows pos_rate rising
    * monotonically with the margin bin; a flat table means the margin
    * carries no signal and the threshold is arbitrary.
    *
    * Scale shape: min/max extremes are a 1-row broadcast (the
    * [[graft.operators.Etl.globalRowIndex]] decomposition), bucketing
    * is a pure projection, the table is one 8-row grouped aggregate —
    * no global sort, no ntile window. */
  def qualityNbCalibrationQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    val held = docs.filter(!isTrain(col("doc_id")))
    val scored = nbScoreRaw(held, col("doc_id"), col("text"), llr, scalars)
      .join(held.select(col("doc_id"), (col("lang") === "en").as("__y")),
        "doc_id")
    val ext = scored.agg(min("__mfx").as("__mn"), max("__mfx").as("__mx"))
    scored.crossJoin(broadcast(ext))
      // long `div` (not `/`, which is double division): non-negative
      // operands, so truncation == floor and DuckDB's `//` agrees
      .withColumn("bucket",
        expr("((__mfx - __mn) * 8) div (__mx - __mn + 1)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__mfx")).as("__smfx"))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"),
        ((col("__smfx").cast("double") / col("n").cast("double")) / lit(1e6))
          .as("mean_margin"))
      .orderBy("bucket")
  }

  /** Exact ROC-AUC of a score column against a boolean label — the
    * threshold-free companion to [[qualityNbCalibrationQ]] (which grades
    * calibration at ONE binning) and [[qualityNbEvalQ]] (ONE threshold):
    * AUC is the probability a random positive outranks a random
    * negative, i.e. the rank-sum / Mann-Whitney U statistic, and it is
    * computable EXACTLY here because the margins are fixed-point longs:
    *
    *   2U = Σ over tie-groups m of  pos(m) · (2·negBelow(m) + neg(m))
    *
    * (ties contribute ½ each — doubling keeps everything in integer
    * arithmetic until the final division). The per-tie-group negative
    * prefix sum is [[graft.operators.Etl.rangePrefixSum]]'s TWO-LEVEL
    * width-bucket decomposition — b1·b2 = 4096 within-cell windows in
    * parallel, cell offsets folded per-bucket (≤ b2 rows each) and the
    * one partition-less window over ≤ b1 bucket totals — so there is NO
    * global sort AND no N/64-rows-in-one-task cap: the shape survives a
    * corpus where the score column has billions of distinct values. The
    * double cast used for bucketing is monotone non-decreasing in the
    * long score, which is all a partitioner needs; ordering WITHIN a
    * cell stays on the exact long. `u2` aggregates as decimal(38,0):
    * it approaches 2·n_pos·n_neg, which overflows int64 past ~2.1e9
    * positives × 2.1e9 negatives — precisely the billions-of-docs
    * regime this shape exists for (exact to 38 digits, i.e. any corpus
    * with n_pos·n_neg < 5e37). Degenerate inputs (single-class labels)
    * yield a NULL auc rather than a NaN — the caller can't mistake "no
    * pairs to rank" for a score. NULL-score rows are EXCLUDED from
    * n_pos/n_neg/u2 (a null score has no rank — [[
    * graft.operators.Etl.rangePrefixSum]]'s declared policy); the NB
    * margin here is non-null by construction, and a caller with
    * nullable scores decides its own imputation before ranking. */
  def aucExact(scored: DataFrame, score: Column, label: Column,
      buckets: Int = 64): DataFrame = {
    val g = scored.select(score.as("__s"), label.as("__y"))
      .groupBy("__s")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__n"))
      // rangePrefixSum reads its input three times — cut here so the NB
      // score pipeline feeding this runs once per action (r20)
      .localCheckpoint(eager = false)
    Etl.rangePrefixSum(g, "__s", "__n", "__nb", b1 = buckets, b2 = buckets)
      .agg(sum("__p").as("n_pos"), sum("__n").as("n_neg"),
        sum(col("__p").cast("decimal(38,0)")
          * (lit(2L) * col("__nb") + col("__n")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(col("u2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")), 6))
          .cast("double").as("auc"))
  }

  /** PER-GROUP [[aucExact]] — the same integer rank-sum with every
    * [[graft.operators.Etl.rangePrefixSum]] stage additionally keyed by
    * the group: tie-groups are (group, score), span extremes one row
    * per group (joined back, AQE-broadcast at any realistic group
    * count), and even the level-1 bucket fold is partitioned by group —
    * no partition-less window at all, and within-group parallelism is
    * b1·b2 cells (not capped at `buckets`). `u2` is decimal(38,0) for
    * the same int64-overflow reason as the whole-relation form. This is
    * the report a per-source gate review reads: WHERE does the
    * classifier rank well, not just whether it does on average. */
  def aucExactBy(scored: DataFrame, group: Column, score: Column,
      label: Column, buckets: Int = 64): DataFrame = {
    val g = scored.select(group.as("grp"), score.as("__s"), label.as("__y"))
      .groupBy("grp", "__s")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__n"))
      .localCheckpoint(eager = false) // the aucExact cut, per group

    Etl.rangePrefixSum(g, "__s", "__n", "__nb", grp = Seq("grp"),
        b1 = buckets, b2 = buckets)
      .groupBy("grp")
      .agg(sum("__p").as("n_pos"), sum("__n").as("n_neg"),
        sum(col("__p").cast("decimal(38,0)")
          * (lit(2L) * col("__nb") + col("__n")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("u2"))
      .select(col("grp"), col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(col("u2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")), 6))
          .cast("double").as("auc"))
  }

  /** Named query: held-out ROC-AUC of the NB gate PER SOURCE — groups
    * with a single-class held-out slice read NULL (no rankable pairs),
    * which is itself the finding: that source can't be graded from this
    * split. `u2` is rendered as its exact integer TEXT (not the
    * decimal(38,0) [[aucExactBy]] computes with): parquet decimal128
    * surfaces as a boxed Decimal in Arrow readers while SQL engines
    * widen it to a float, so a decimal output column value-compares
    * unstably across consumers even when bit-equal — text is the one
    * rendering exact to all 38 digits everywhere. */
  def qualityNbAucBySourceQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    val held = docs.filter(!isTrain(col("doc_id")))
    val scored = nbScoreRaw(held, col("doc_id"), col("text"), llr, scalars)
      .join(held.select(col("doc_id"), col("source"),
        (col("lang") === "en").as("__y")), "doc_id")
    aucExactBy(scored, col("source"), col("__mfx"), col("__y"))
      .withColumnRenamed("grp", "source")
      .withColumn("u2", col("u2").cast("string"))
      .orderBy("source")
  }

  /** Named query: held-out ROC-AUC of the NB quality gate — the single
    * number a filter-strength comparison reads (DCLM's headline metric
    * for ranking quality classifiers). Integer rank-sum ⇒ bit-exact
    * oracle; on THIS testdata it honestly reads ≈0.5 for the reason
    * documented on [[qualityNbEvalQ]] (the synthetic corpus carries no
    * token↔label signal — ClassifySpec proves >0.95 on a corpus that
    * does). `u2` is exact-integer TEXT in the output for the reason on
    * [[qualityNbAucBySourceQ]] (decimal columns value-compare unstably
    * across Arrow/SQL consumers). */
  def qualityNbAucQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    val held = docs.filter(!isTrain(col("doc_id")))
    val scored = nbScoreRaw(held, col("doc_id"), col("text"), llr, scalars)
      .join(held.select(col("doc_id"), (col("lang") === "en").as("__y")),
        "doc_id")
    aucExact(scored, col("__mfx"), col("__y"))
      .withColumn("u2", col("u2").cast("string"))
  }

  /** Named query: train on the md5-half with `lang = 'en'` as the weak
    * positive label, score EVERY document (train rows included — the
    * filter consumes the margin, not the split). */
  def qualityNbQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    nbScore(docs, col("doc_id"), col("text"), llr, scalars)
      .orderBy("doc_id")
  }

  /** Named query: model inspection — the 20 terms with the largest
    * |llr| (the classifier's most decisive features either way),
    * deterministic tie-break on the term. */
  def qualityNbModelQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, _) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    llr.select(col("term"), col("llr_fx"),
        (col("llr_fx").cast("double") / lit(1e6)).as("llr"))
      .orderBy(abs(col("llr_fx")).desc, col("term").asc)
      .limit(20)
  }

  /** Named query: INCREMENTAL model refresh — the train half arrives in
    * two batches (doc_id ≤ cut, then the rest); the increment's counts
    * merge into the base state and the model finalizes from the merged
    * counts. Scores must equal [[qualityNbQ]] bit for bit (it shares
    * that query's oracle), which holds only if count-merge ≡ full
    * retrain — the composition property a daily model-refresh job
    * relies on (only the increment is ever tokenized again). */
  def qualityNbIncrQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(isTrain(col("doc_id")))
    val cutRow = docs.agg(expr("max(doc_id) * 4 DIV 5").as("c")).head()
    val cut = if (cutRow.isNullAt(0)) -1L else cutRow.getLong(0)
    val isPos = col("lang") === "en"
    val base = nbCounts(train.filter(col("doc_id") <= cut), col("text"), isPos)
    val incr = nbCounts(train.filter(col("doc_id") > cut), col("text"), isPos)
    val (counts, docsN) = nbCountsMerge(base, incr)
    val (llr, scalars) = nbModelFromCounts(counts, docsN)
    nbScore(docs, col("doc_id"), col("text"), llr, scalars)
      .orderBy("doc_id")
  }

  /** Named query: held-out evaluation — confusion counts + accuracy of
    * the trained model on the NON-train half only (the split the model
    * never saw). Integer counts ⇒ bit-exact oracle; the measured
    * contract behind shipping the filter (same discipline as
    * `ann_recall` for the ANN arms — a classifier row without an eval
    * row is half a feature).
    *
    * On THIS testdata the row honestly reads ~chance: the synthetic
    * corpus draws one shared vocabulary for every `lang`, so no token
    * carries label signal (measured ≈0.55 across every candidate weak
    * label). That is a property of the data, not the operator —
    * ClassifySpec proves >0.95 held-out accuracy on a corpus whose
    * labels ARE expressed in its tokens. The eval row exists precisely
    * so a user sees that number BEFORE trusting the gate. */
  def qualityNbEvalQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    val held = docs.filter(!isTrain(col("doc_id")))
    nbScore(held, col("doc_id"), col("text"), llr, scalars)
      .join(held.select(col("doc_id"), (col("lang") === "en").as("__y")),
        "doc_id")
      .agg(
        sum(when(col("pred_pos") && col("__y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred_pos") && !col("__y"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred_pos") && !col("__y"), 1L).otherwise(0L)).as("tn"),
        sum(when(!col("pred_pos") && col("__y"), 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        ((col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"))
          .as("accuracy"))
  }

  /** Named query: the MODEL-GATED mixing pipeline (the DCLM shape:
    * classifier gate → distribution rebalance → budget cap) as one
    * lineage — documents the trained filter admits
    * ([[nbScore]].pred_pos) flow through
    * [[Curation.temperatureSample]] (α = 0.5 language rebalance over
    * the ADMITTED set — the counts the sampler sees are post-gate, the
    * composition the oracle must replay) and then
    * [[Curation.capTokensPerGroup]] (2,000-token budget per source).
    * Train, gate, rebalance, and cap are a single Catalyst plan. */
  def pipelineQualityMixQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    // temperatureSample reads its input TWICE (the per-language count
    // table and the admit join), so without a cut the whole NB
    // train+tokenize+score subtree above executes twice per action (the
    // before-plan held 42 parquet scans / 49 Exchanges). Lazy cut,
    // values unchanged (r21, the r20 top-fraction/AUC discipline).
    val kept = nbScore(docs, col("doc_id"), col("text"), llr, scalars)
      .filter(col("pred_pos"))
      .join(docs.select("doc_id", "lang", "source"), "doc_id")
      .localCheckpoint(eager = false)
    val sampled = Curation.temperatureSample(kept, col("lang"),
      col("doc_id"), alpha = 0.5)
    Curation.capTokensPerGroup(sampled, col("source"), col("doc_id"),
        col("n_tokens"), budget = 2000L)
      .select("doc_id", "lang", "source", "n_tokens", "cum_before")
      .orderBy("doc_id")
  }

  // --- DSIR importance resampling ------------------------------------------

  /** DSIR (Data Selection via Importance Resampling): estimate hashed
    * n-gram bag-of-buckets distributions for the TARGET subset and the
    * RAW corpus, weight each document by its log importance ratio
    * Σ ln(p_target(bucket)/p_raw(bucket)), and Gumbel-top-k select — the
    * exp(log w)-proportional sample without normalizing constants, made
    * deterministic by drawing the Gumbel noise from the document-id
    * hash (same md5-uniform every sampler here uses).
    *
    * Features are unigrams ∪ bigrams hashed into `buckets` buckets
    * (the paper's hashed n-gram reduction): model size is O(buckets),
    * so both distributions broadcast no matter the corpus size. */
  def dsirSelect(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 256, n: Int = 100): DataFrame = {
    require(buckets >= 2, s"dsirSelect: buckets >= 2, got $buckets")
    require(n >= 1, s"dsirSelect: n >= 1, got $n")
    val s = docs.sparkSession
    // fused unigram+bigram md5 bucketing ([[TextExpressions
    // .gramBuckets]]): one primitive pass per document instead of
    // interpreted shingle-string HOFs + per-gram md5 Columns (~6× on
    // the benched query; bit-identical to the oracle's
    // conv(substring(md5(g),1,8),16,10) % buckets — parity is pinned
    // by ClassifySpec)
    val gb = docs
      .select(id.as("doc_id"), isTarget.as("__tgt"),
        explode(graft.functions.TextExpressions
          .gramBuckets(s, tokens(text), buckets)).as("__b"))
    // the exploded gram subtree (the expensive md5-per-gram leg) feeds
    // exactly TWO consumers: one conditional-sum bucket aggregate (raw
    // and target counts together — not separate raw/target/total scans)
    // and the per-doc weight sum. Both reduce map-side before their
    // shuffle, so the only data crossing the wire is `buckets` rows and
    // one partial sum per (task, doc) — NOT the exploded grams.
    val bcnt = gb.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    val tots = bcnt.agg(sum("__cr").as("__tr"), sum("__ct").as("__tt"))
    // per-bucket fixed-point log ratio, add-1 smoothed over all buckets
    val lr = bcnt.crossJoin(broadcast(tots))
      .select(col("__b"),
        fx(log((col("__ct") + lit(1L)).cast("double")
            / (col("__tt") + lit(buckets.toLong)).cast("double"))
          - log((col("__cr") + lit(1L)).cast("double")
            / (col("__tr") + lit(buckets.toLong)).cast("double"))).as("__lrfx"))
    val dw = gb.join(broadcast(lr), Seq("__b")) // `buckets` rows — broadcast
      .groupBy("doc_id").agg(sum("__lrfx").as("__wfx"))
    // Gumbel key: u ∈ (0,1) from the id hash (+0.5 keeps u off both
    // endpoints exactly), g = -ln(-ln(u))
    val u = graft.functions.HashFunctions.md5UniformOpen(
      concat(lit("g"), col("doc_id").cast("string")))
    val scored = dw.withColumn("score",
      round(col("__wfx").cast("double") / lit(1e6) + (-log(-log(u))), 6))
    // top-n is orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps, no global sort); the rank window then runs over ≤ n rows
    val top = scored.orderBy(desc("score"), asc("doc_id")).limit(n)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))).cast("long"))
      .select("doc_id", "score", "rank")
  }

  /** Named query: resample toward the English subset as the target
    * distribution (the reference curation targets a "clean" slice; any
    * predicate works), 256 hashed-n-gram buckets, keep 100. */
  def curateDsirQ(s: SparkSession, d: String): DataFrame =
    dsirSelect(Tables.documents(s, d), col("doc_id"), col("text"),
      col("lang") === "en")
      .orderBy("rank")

  /** Named query: temperature mixing over LATENT domains — when the
    * corpus has no trustworthy domain column, balance over semantic
    * clusters instead: each document's embedding is argmax-assigned to
    * the shared centroid codebook (the proven SemDeDup assignment) and
    * [[Curation.temperatureSample]] rebalances over CLUSTER sizes
    * exactly as `mix_temperature` does over `lang` — cluster-based data
    * balancing, the standard recipe when domains are implicit. One
    * assignment scan + the broadcast count table; no new machinery. */
  def mixSemanticQ(s: SparkSession, d: String): DataFrame = {
    val assigned = Dedup.semanticAssign(Tables.embeddings(s, d),
      col("vec_id"), col("embedding"),
      Retrieval.labelCentroids(s, d).select(col("label").as("cid"), col("c")))
    val docs = Tables.documents(s, d)
      .join(assigned.select(col("__vid").as("doc_id"), col("cluster")),
        "doc_id")
    Curation.temperatureSample(docs, col("cluster"), col("doc_id"),
        alpha = 0.5)
      .select("doc_id", "cluster", "source")
      .orderBy("doc_id")
  }

  // --- deterministic holdout split -----------------------------------------

  /** Named query: 80/10/10 train/val/test assignment from the id hash —
    * stateless, shuffle-free, and STABLE: a document's split never
    * changes as the corpus grows (the property a rank- or PRNG-based
    * split lacks), so no eval example ever migrates into training. */
  def holdoutSplit(id: Column): Column = {
    val u = graft.functions.HashFunctions.md5Uniform(id)
    when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
  }

  def splitHoldoutQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        holdoutSplit(col("doc_id")).as("split"))
      .orderBy("doc_id")

  /** Named query: LEAKAGE-SAFE holdout — the id-hash split with one
    * amendment: near-duplicate documents land in the SAME split. A plain
    * per-id split leaks whenever train and test hold near-copies of the
    * same document (the classic eval inflation The Pile / C4 dedup
    * papers warn about); hashing the near-dup CLUSTER id instead of the
    * doc id makes every cluster atomic, and because the cluster label is
    * the component MIN doc id, a singleton's key equals its own id — so
    * this query is [[splitHoldoutQ]] exactly, except on docs that have a
    * ≥0.35 near-dup partner. Composition: the [[Dedup.dupClusters]]
    * lineage yields (doc, cluster) for clustered docs only (index-scale,
    * the near-dup minority); one LEFT join + coalesce extends it to the
    * corpus, and membership stays stable as the corpus grows unless the
    * cluster itself changes (the same stability argument as
    * [[holdoutSplit]], now at cluster granularity). */
  def splitLeakageSafeQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select("doc_id")
      .join(Dedup.clusterAssignments(s, d), Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("split_key"),
        holdoutSplit(col("split_key")).as("split"))
      .orderBy("doc_id")

  /** TOP-FRACTION selection by score — the step production classifier
    * gates actually run (DCLM / FineWeb-Edu keep the top ~10% BY RANK,
    * not everything above margin 0: a fixed threshold drifts as the
    * corpus mix shifts, a fraction doesn't). Admit every document whose
    * strict-above count is < k = max(1, ⌊frac·N⌋) — ties at the cut
    * admit WHOLESALE (deterministic; a tie-broken cut would depend on an
    * arbitrary secondary order). NO global sort: tie-group counts →
    * [[graft.operators.Etl.rangePrefixSum]]'s two-level width-bucket
    * decomposition gives each score's strictly-above mass (b1·b2-way
    * parallel, no N/buckets single-task cap), and docs join back on
    * their score.
    * At 100 TB the only corpus-scale shuffles are the tie-group reduce
    * and the admit join — both score-keyed. */
  def topFractionByScore(scored: DataFrame, id: Column, score: Column,
      frac: Double, buckets: Int = 64): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac in (0,1], got $frac")
    // read twice (the tie-group reduce and the admit join) — without a
    // cut the caller's scoring pipeline (for the named query: NB
    // tokenize + score over the corpus) executes twice per action.
    // Lazy cut, values unchanged (r20).
    val rows = scored.select(id.as("doc_id"), score.as("__s"))
      .localCheckpoint(eager = false)
    val t = rows.groupBy("__s").agg(count(lit(1)).as("__c"))
      .localCheckpoint(eager = false) // rangePrefixSum reads it 3× (r20)
    val n = broadcast(t.agg(sum("__c").as("__N")))
    val admitted =
      Etl.rangePrefixSum(t, "__s", "__c", "__below",
          b1 = buckets, b2 = buckets)
        .crossJoin(n)
        // strictly-above mass = N − (strictly-below + own count)
        .filter(col("__N") - col("__below") - col("__c") <
          greatest(lit(1L), floor(lit(frac) * col("__N")).cast("long")))
        .select("__s")
    rows.join(admitted, "__s").select("doc_id", "__s")
  }

  /** Named query: keep the top 10% of the corpus by NB margin (ties at
    * the cut admitted wholesale — row count can exceed ⌊N/10⌋, which is
    * the honest semantics). */
  def curateTopFractionQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (llr, scalars) = nbModel(docs.filter(isTrain(col("doc_id"))),
      col("text"), col("lang") === "en")
    val scored = nbScoreRaw(docs, col("doc_id"), col("text"), llr, scalars)
    topFractionByScore(scored, col("doc_id"), col("__mfx"), frac = 0.1)
      .select(col("doc_id"),
        (col("__s").cast("double") / lit(1e6)).as("nb_margin"))
      // sampled-sort cut (r21, the gopherQuality note)
      .localCheckpoint(eager = false)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_nb" -> qualityNbQ,
    "quality_nb_model" -> qualityNbModelQ,
    "quality_nb_incr" -> qualityNbIncrQ,
    "quality_nb_eval" -> qualityNbEvalQ,
    "quality_nb_calibration" -> qualityNbCalibrationQ,
    "quality_nb_auc" -> qualityNbAucQ,
    "quality_nb_auc_src" -> qualityNbAucBySourceQ,
    "curate_top_fraction" -> curateTopFractionQ,
    "pipeline_quality_mix" -> pipelineQualityMixQ,
    "curate_dsir" -> curateDsirQ,
    "mix_semantic" -> mixSemanticQ,
    "split_holdout" -> splitHoldoutQ,
    "split_leakage_safe" -> splitLeakageSafeQ)

  private val toksSql = "string_split(lower(text), ' ')"

  /** The NB lineage as shared CTEs: split → class×token counts →
    * smoothed fixed-point llr → per-doc integer sum. */
  private[operators] def nbSql = s"""
    WITH t AS (SELECT doc_id, lang, $toksSql AS toks,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS tr
         FROM documents),
    tok AS (SELECT doc_id, lang = 'en' AS pos, tr, unnest(toks) AS term FROM t),
    cnt AS (SELECT term,
            sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
            sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cn
          FROM tok WHERE tr GROUP BY term),
    tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn, count(*) AS v FROM cnt),
    nd AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
            sum(CASE WHEN NOT (lang = 'en') THEN 1 ELSE 0 END) AS nn
          FROM t WHERE tr),
    llr AS (SELECT term,
            CAST(round((ln(CAST(cp + 1 AS DOUBLE) / CAST(tp + v AS DOUBLE))
              - ln(CAST(cn + 1 AS DOUBLE) / CAST(tn + v AS DOUBLE)))
              * 1000000) AS BIGINT) AS llr_fx
          FROM cnt CROSS JOIN tot),
    sc AS (SELECT
            CAST(round((ln(1.0 / CAST(tp + v AS DOUBLE))
              - ln(1.0 / CAST(tn + v AS DOUBLE))) * 1000000) AS BIGINT) AS ufx,
            CAST(round((ln(CAST(np AS DOUBLE)) - ln(CAST(nn AS DOUBLE)))
              * 1000000) AS BIGINT) AS pfx
          FROM tot CROSS JOIN nd)"""

  val oracleSql: Map[String, String] = Map(
    "quality_nb" -> s"""$nbSql,
      ds AS (SELECT doc_id, unnest(toks) AS term FROM t),
      agg AS (SELECT doc_id,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx,
              count(*) AS n_tokens
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(mfx AS DOUBLE) / 1000000.0 AS nb_margin,
        mfx > 0 AS pred_pos
      FROM agg ORDER BY doc_id""",
    "quality_nb_model" -> s"""$nbSql
      SELECT term, llr_fx, CAST(llr_fx AS DOUBLE) / 1000000.0 AS llr
      FROM llr ORDER BY abs(llr_fx) DESC, term LIMIT 20""",
    // count-merge ≡ full retrain: the incremental run must reproduce the
    // FULL training replay exactly (this is quality_nb's oracle verbatim)
    "quality_nb_incr" -> s"""$nbSql,
      ds AS (SELECT doc_id, unnest(toks) AS term FROM t),
      agg AS (SELECT doc_id,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx,
              count(*) AS n_tokens
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(mfx AS DOUBLE) / 1000000.0 AS nb_margin,
        mfx > 0 AS pred_pos
      FROM agg ORDER BY doc_id""",
    // gate → temperature (α=0.5 over the ADMITTED set) → token budget;
    // every stage reuses an already-proven CTE shape
    "pipeline_quality_mix" -> s"""$nbSql,
      ds AS (SELECT doc_id, unnest(toks) AS term FROM t),
      agg AS (SELECT doc_id,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx,
              count(*) AS n_tokens
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id),
      kept AS (SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens,
              d.lang, d.source
            FROM agg a JOIN documents d ON a.doc_id = d.doc_id
            WHERE a.mfx > 0),
      c AS (SELECT lang, count(*) AS c FROM kept GROUP BY lang),
      m AS (SELECT min(c) AS cmin FROM c),
      fr AS (SELECT lang, sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE)) AS f
            FROM c, m),
      u AS (SELECT doc_id, lang, source, n_tokens, ${Curation.hexUSql} AS uu
            FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                  FROM kept)),
      samp AS (SELECT u.doc_id, u.lang, u.source, u.n_tokens
            FROM u JOIN fr USING (lang)
            WHERE CAST(uu AS DOUBLE) / 4294967296.0 < f),
      w AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            FROM samp)
      SELECT doc_id, lang, source, n_tokens,
        CAST(cum_before AS BIGINT) AS cum_before
      FROM w WHERE cum_before < 2000 ORDER BY doc_id""",
    "quality_nb_calibration" -> s"""$nbSql,
      ds AS (SELECT doc_id, lang = 'en' AS y, unnest(toks) AS term
             FROM t WHERE NOT tr),
      agg AS (SELECT doc_id, max(y) AS y,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id),
      ext AS (SELECT min(mfx) AS mn, max(mfx) AS mx FROM agg),
      b AS (SELECT CAST(((mfx - mn) * 8) // (mx - mn + 1) AS BIGINT) AS bucket,
              y, mfx FROM agg CROSS JOIN ext)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS pos_rate,
        (CAST(sum(mfx) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1000000.0
          AS mean_margin
      FROM b GROUP BY bucket ORDER BY bucket""",
    // exact rank-sum AUC: the oracle spells the DIRECT definition (one
    // window over ordered tie-groups — fine in DuckDB), the Spark side
    // the bucketed prefix-sum decomposition; equal integers either way
    "quality_nb_auc" -> s"""$nbSql,
      ds AS (SELECT doc_id, lang = 'en' AS y, unnest(toks) AS term
             FROM t WHERE NOT tr),
      agg AS (SELECT doc_id, max(y) AS y,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id),
      g AS (SELECT mfx AS s,
              CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
              CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n
            FROM agg GROUP BY mfx),
      w AS (SELECT p, n, COALESCE(SUM(n) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS neg_below
            FROM g),
      u AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
              CAST(sum(n) AS BIGINT) AS n_neg,
              CAST(sum(p * (2 * neg_below + n)) AS DECIMAL(38,0)) AS u2
            FROM w)
      SELECT n_pos, n_neg, CAST(u2 AS VARCHAR) AS u2,
        CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
          ELSE round(CAST(u2 AS DOUBLE)
            / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
        END AS auc
      FROM u""",
    // top-fraction: the oracle spells the direct window (cum count over
    // mfx DESC); ties at the cut admitted wholesale on both sides
    "curate_top_fraction" -> s"""$nbSql,
      ds AS (SELECT doc_id, unnest(toks) AS term FROM t),
      agg AS (SELECT doc_id,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id),
      tg AS (SELECT mfx, count(*) AS c FROM agg GROUP BY mfx),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM tg),
      w AS (SELECT mfx, c, COALESCE(SUM(c) OVER (ORDER BY mfx DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
            FROM tg),
      adm AS (SELECT mfx FROM w, n
            WHERE above < greatest(1, CAST(floor(0.1 * N) AS BIGINT)))
      SELECT a.doc_id, CAST(a.mfx AS DOUBLE) / 1000000.0 AS nb_margin
      FROM agg a JOIN adm USING (mfx) ORDER BY a.doc_id""",
    // per-source AUC: same direct window spelling, PARTITION BY source
    "quality_nb_auc_src" -> s"""$nbSql,
      ds AS (SELECT doc_id, lang = 'en' AS y, unnest(toks) AS term
             FROM t WHERE NOT tr),
      agg AS (SELECT doc_id, max(y) AS y,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id),
      ag AS (SELECT a.doc_id, d.source, a.y, a.mfx
            FROM agg a JOIN documents d ON a.doc_id = d.doc_id),
      g AS (SELECT source, mfx AS s,
              CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
              CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n
            FROM ag GROUP BY source, mfx),
      w AS (SELECT source, p, n, COALESCE(SUM(n) OVER (PARTITION BY source
              ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS neg_below
            FROM g),
      u AS (SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
              CAST(sum(n) AS BIGINT) AS n_neg,
              CAST(sum(p * (2 * neg_below + n)) AS DECIMAL(38,0)) AS u2
            FROM w GROUP BY source)
      SELECT source, n_pos, n_neg, CAST(u2 AS VARCHAR) AS u2,
        CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
          ELSE round(CAST(u2 AS DOUBLE)
            / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
        END AS auc
      FROM u ORDER BY source""",
    "quality_nb_eval" -> s"""$nbSql,
      ds AS (SELECT doc_id, lang = 'en' AS y, unnest(toks) AS term
             FROM t WHERE NOT tr),
      agg AS (SELECT doc_id, max(y) AS y,
              CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx
            FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id)
      SELECT
        CAST(sum(CASE WHEN mfx > 0 AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN mfx > 0 AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN mfx <= 0 AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(sum(CASE WHEN mfx <= 0 AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(sum(CASE WHEN (mfx > 0) = y THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS accuracy
      FROM agg""",
    "curate_dsir" -> s"""
      WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
      g0 AS (SELECT doc_id, lang,
             list_concat(toks, ${Curation.shinglesSql(2)}) AS grams FROM t),
      gb AS (SELECT doc_id, lang, ${Curation.hexUSql} % 256 AS b
            FROM (SELECT doc_id, lang, substr(md5(g), 1, 8) AS h
                  FROM (SELECT doc_id, lang, unnest(grams) AS g FROM g0))),
      raw AS (SELECT b, count(*) AS cr FROM gb GROUP BY b),
      tgt AS (SELECT b, count(*) AS ct FROM gb WHERE lang = 'en' GROUP BY b),
      tots AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt,
              count(*) AS tr2 FROM gb),
      lr AS (SELECT raw.b,
             CAST(round((ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
                 / CAST(tt + 256 AS DOUBLE))
               - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr2 + 256 AS DOUBLE)))
               * 1000000) AS BIGINT) AS lrfx
           FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots),
      dw AS (SELECT doc_id, CAST(sum(lrfx) AS BIGINT) AS wfx
            FROM gb JOIN lr ON gb.b = lr.b GROUP BY doc_id),
      gu AS (SELECT doc_id, ($hexUSqlG + 0.5) / 4294967296.0 AS u
            FROM (SELECT doc_id,
                    substr(md5('g' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
                  FROM t)),
      fin AS (SELECT dw.doc_id,
             round(CAST(wfx AS DOUBLE) / 1000000.0 + (-ln(-ln(u))), 6) AS score
           FROM dw JOIN gu ON dw.doc_id = gu.doc_id)
      SELECT doc_id, score,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      FROM fin ORDER BY score DESC, doc_id LIMIT 100""",
    // SemDeDup's proven assignment pyramid + mix_temperature's sampler,
    // keyed on the latent cluster
    "mix_semantic" -> s"""
      WITH ${Dedup.semAssignSql},
      u AS (SELECT d.doc_id, a.cluster, d.source, ${Curation.hexUSql} AS uu
            FROM (SELECT doc_id, source,
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                  FROM documents) d
            JOIN assign a ON d.doc_id = a.vec_id),
      -- counts over the JOINED (document ∩ assignment) set — the
      -- population the sampler balances — matching temperatureSample's
      -- counting base exactly, not the raw embedding assignments
      c AS (SELECT cluster, count(*) AS c FROM u GROUP BY cluster),
      m AS (SELECT min(c) AS cmin FROM c),
      f AS (SELECT cluster, sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE)) AS f
            FROM c, m)
      SELECT u.doc_id, u.cluster, u.source FROM u JOIN f USING (cluster)
      WHERE CAST(uu AS DOUBLE) / 4294967296.0 < f ORDER BY doc_id""",
    "split_holdout" -> s"""
      WITH u AS (SELECT doc_id, lang,
             CAST(${Curation.hexUSql} AS DOUBLE) / 4294967296.0 AS uu
           FROM (SELECT doc_id, lang,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                 FROM documents))
      SELECT doc_id, lang,
        CASE WHEN uu < 0.8 THEN 'train' WHEN uu < 0.9 THEN 'val'
          ELSE 'test' END AS split
      FROM u ORDER BY doc_id""",
    // the dedup_clusters recursive-CTE lineage (same blocking, same
    // ≥0.35 exact-Jaccard edges) feeding the split-hash on the cluster
    // key — the oracle replays clustering AND assignment end to end
    "split_leakage_safe" -> s"""
      WITH RECURSIVE t AS (SELECT doc_id,
           lang || '_' || (n_chars // 100) AS blk,
           string_split(lower(text), ' ') AS toks FROM documents),
      sh AS (SELECT doc_id, blk, list_distinct(${Dedup.shSql}) AS sh FROM t),
      rawpair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
          len(a.sh) AS na, len(b.sh) AS nb
        FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id),
      pair AS (SELECT doc_a, doc_b FROM rawpair
        WHERE CAST(inter AS DOUBLE)
          / nullif(CAST(na + nb - inter AS DOUBLE), 0.0) >= 0.35),
      edge AS (SELECT doc_a AS a, doc_b AS b FROM pair
        UNION SELECT doc_b, doc_a FROM pair
        UNION SELECT doc_a, doc_a FROM pair
        UNION SELECT doc_b, doc_b FROM pair),
      reach(a, b) AS (SELECT a, b FROM edge
        UNION SELECT r.a, e.b FROM reach r JOIN edge e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster
        FROM reach GROUP BY a),
      k AS (SELECT d.doc_id,
          CAST(COALESCE(cl.cluster, d.doc_id) AS BIGINT) AS split_key
        FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
      u AS (SELECT doc_id, split_key,
          CAST(${Curation.hexUSql} AS DOUBLE) / 4294967296.0 AS uu
        FROM (SELECT doc_id, split_key,
                substr(md5(CAST(split_key AS VARCHAR)), 1, 8) AS h
              FROM k))
      SELECT doc_id, split_key,
        CASE WHEN uu < 0.8 THEN 'train' WHEN uu < 0.9 THEN 'val'
          ELSE 'test' END AS split
      FROM u ORDER BY doc_id""")

  /** [[Curation.hexUSql]] emits an un-parenthesized sum-of-terms; this
    * alias keeps the `(expr + 0.5)` composition readable above. */
  private def hexUSqlG = s"CAST(${Curation.hexUSql} AS DOUBLE)"
}
