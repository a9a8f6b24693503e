package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Metadata-ETL operators (SURVEY.md §2.2 P1–P17, §2.1 S1–S7).
  *
  * The reference cleans a photo-metadata CSV through a chain of scripts
  * (`/root/reference/filter_label_paths.py`, `clean_label_etiketler.py`,
  * `clean_and_fill_na.py`, `upload_features_to_elasticsearch.py:95-114`).
  * Each step is re-expressed as a declarative Column transform so Catalyst
  * pushes the work into one codegen'd scan — no per-row Python, no
  * intermediate CSV materialization.
  *
  * Every query orders its output deterministically and aliases every
  * computed column identically to its DuckDB oracle (driver hash-compares
  * after sorting columns by name).
  */
object Etl {

  /** P1/P2 — prefix filter (the reference's train/test split on
    * `kapak_gorseli.startswith('dataset/')`, filter_label_paths.py:41-54). */
  def prefixSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("source").startsWith("src1"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  /** P3/P4 — cell cleanse: pattern→empty (clean_label_etiketler.py:5-16) and
    * sentinel fill (clean_and_fill_na.py:4-17). */
  def cellCleanse(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(col("text").contains("slow"), lit(""))
          .otherwise(substring(col("text"), 1, 40)).as("text_clean"),
        when(trim(col("lang")) === "" || col("lang").isin("zh"), lit("NA"))
          .otherwise(col("lang")).as("lang_filled"))
      .orderBy("doc_id")

  /** P5 — safe casts (`safe_int/safe_float/safe_str`,
    * upload_features_to_elasticsearch.py:95-114): JSON field → long,
    * sentinel → NULL, int-via-float truncation. */
  def safeCast(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        nullif(col("event_type"), lit("error")).as("etype_nullable"),
        floor(col("value")).cast("long").as("value_int"))
      .orderBy("event_id")

  /** R1 — deterministic sampling. The reference seeds Python's PRNG
    * (`random.seed(42)`, sam_segment_clip_pipeline.py:150-151); cross-
    * runtime PRNG equality is impossible (SURVEY.md §7.4), so the engine
    * samples by CONTENT HASH instead: stable across runtimes, insert
    * order, and partitioning — the property a reproducible training-data
    * split actually needs. Keeps ~2/16 of rows (md5 first hex digit). */
  def hashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** R1 extension — stratified deterministic split: per-language sampling
    * fractions applied via md5 hash buckets (see [[hashSample]] for why
    * hashing beats PRNG seeding). The training-mix knob of a data
    * pipeline: e.g. keep 50% of 'en', 25% of everything else, stably. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    // bucket ∈ [0, 16): first hex digit of md5(doc_id)
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("int")
    Tables.documents(s, d)
      .withColumn("bkt", bucket)
      .filter(when(col("lang") === "en", col("bkt") < 8).otherwise(col("bkt") < 4))
      .select("doc_id", "lang", "bkt")
      .orderBy("doc_id")
  }

  /** R1 extension — N deterministic example rows per group ("show me 3
    * docs per source", the spot-check every curation review starts
    * with). Fraction samplers ([[hashSample]]/[[stratifiedSample]])
    * can't pin a COUNT; the window spelling (`row_number() OVER
    * (PARTITION BY g ORDER BY u) <= N`) sorts each group's full stream.
    * [[graft.functions.BottomKAgg.bottomKIds]] keeps the N (u, id)-
    * smallest per group in a mergeable Aggregator buffer — map-side
    * partials, ≤N pairs per (group, partition) shuffle — and the md5
    * uniform makes the pick reproducible run-to-run and engine-to-
    * engine; the id tiebreak makes it total-ordered, so the sample is
    * partitioning-independent even across 32-bit hash-prefix ties. */
  def groupSample(df: DataFrame, group: Column, id: Column, n: Int)
      : DataFrame = {
    require(n >= 1, s"groupSample: n >= 1, got $n")
    df.filter(id.isNotNull)
      .select(group.as("grp"),
        graft.functions.HashFunctions.md5UniformOpen(id).as("__u"),
        id.cast("long").as("__id"))
      .groupBy("grp")
      .agg(graft.functions.BottomKAgg.bottomKIds(n)(col("__u"), col("__id"))
        .as("__ids"))
      .select(col("grp"), posexplode(col("__ids")).as(Seq("pos", "doc_id")))
      .select(col("grp"), (col("pos") + 1).as("rank"), col("doc_id"))
  }

  /** Named query: 3 reproducible sample docs per source. */
  def groupSampleQ(s: SparkSession, d: String): DataFrame =
    groupSample(Tables.documents(s, d), col("source"), col("doc_id"), n = 3)
      .withColumnRenamed("grp", "source")
      .orderBy("source", "rank")

  /** WEIGHTED [[groupSample]] — Efraimidis-Spirakis (2006) reservoir
    * keys on the deterministic uniform: drawing N without replacement
    * with probability ∝ weight is exactly "take the N largest
    * u^(1/w)", i.e. the N smallest `−ln(u)/w` — a pure key transform,
    * so the SAME mergeable bottom-k machinery (and the same
    * partitioning-independence argument) carries the weighted case.
    * The curation face: "sample docs proportional to length/quality
    * score" without a global sort or an RNG. Zero/negative weights are
    * excluded (a zero-weight row has sampling probability 0; E-S keys
    * would divide by it). */
  def weightedGroupSample(df: DataFrame, group: Column, id: Column,
      weight: Column, n: Int): DataFrame = {
    require(n >= 1, s"weightedGroupSample: n >= 1, got $n")
    df.filter(id.isNotNull && weight.isNotNull && weight > 0)
      .select(group.as("grp"),
        (-log(graft.functions.HashFunctions.md5UniformOpen(id))
          / weight.cast("double")).as("__key"),
        id.cast("long").as("__id"))
      .groupBy("grp")
      .agg(graft.functions.BottomKAgg.bottomKIds(n)(col("__key"), col("__id"))
        .as("__ids"))
      .select(col("grp"), posexplode(col("__ids")).as(Seq("pos", "doc_id")))
      .select(col("grp"), (col("pos") + 1).as("rank"), col("doc_id"))
  }

  /** Named query: 3 length-weighted sample docs per source (longer docs
    * proportionally likelier — the shape a token-budgeted reviewer
    * samples by). */
  def weightedSampleQ(s: SparkSession, d: String): DataFrame =
    weightedGroupSample(Tables.documents(s, d), col("source"),
      col("doc_id"), col("n_chars"), n = 3)
      .withColumnRenamed("grp", "source")
      .orderBy("source", "rank")

  /** R2 — contiguous global row index over a total order, WITHOUT the
    * single-task `row_number().over(Window.orderBy(id))` bottleneck: the
    * id span is cut into order-preserving range buckets (`width_bucket`
    * is monotonic in id), row_number runs per bucket, and the per-bucket
    * row counts (≤ `buckets` rows) get an exclusive cumulative sum that
    * broadcasts back as each bucket's starting offset. Identical output
    * to the flat window; parallelism = buckets instead of 1. Same
    * scan/offset decomposition as [[Curation.packSequences]]. `id` must
    * be numeric (range-bucketed); skewed id spans cost balance only,
    * never correctness. 0-based. */
  def globalRowIndex(df: DataFrame, id: Column, buckets: Int = 64): DataFrame = {
    val in = df.withColumn("__gid", id.cast("double"))
    val span = in.agg(min("__gid").as("__lo"), max("__gid").as("__hi"))
    val bucketed = in.crossJoin(broadcast(span))
      .withColumn("__bkt",
        width_bucket(col("__gid"), col("__lo"), col("__hi") + 1, lit(buckets)))
      .drop("__lo", "__hi")
    val wLoc = Window.partitionBy("__bkt").orderBy(id)
    // ≤ `buckets` rows flow through this partition-less window — fine.
    val wOff = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .select("__bkt", "__off")
    bucketed
      .withColumn("__ln", row_number().over(wLoc).cast("long"))
      .join(broadcast(offsets), "__bkt")
      .withColumn("global_idx", col("__off") + col("__ln") - 1L)
      .drop("__gid", "__bkt", "__ln", "__off")
  }

  /** Exclusive prefix sum of `valCol` in `sCol`-order over tie-group
    * rows, WITHOUT a global sort and WITHOUT the single-level cap of
    * [[globalRowIndex]]'s shape (parallelism = buckets, i.e. N/64 rows
    * sorting in one task when scores are near-unique at corpus scale).
    * TWO-LEVEL width-bucket decomposition instead:
    *
    *  - the value span is cut into `b1·b2` order-preserving CELLS
    *    (width_bucket over the monotone double cast; ordering within a
    *    cell stays on the exact original column);
    *  - the within-cell prefix windows partition by cell —
    *    parallelism = b1·b2 (4096 at the defaults), each task holding
    *    ~N/(b1·b2) tie-groups;
    *  - cell offsets fold hierarchically: per-bucket windows over ≤ b2
    *    cell rows each (partitioned by the level-1 bucket), then ONE
    *    partition-less window over ≤ b1 bucket totals — never over the
    *    full cell table.
    *
    * Sizing rule: parallelism = b1·b2; the only partition-less fold
    * sees ≤ b1 rows; every partitioned offset window sees ≤ b2 rows.
    * Raise b1/b2 together for bigger clusters — cost is the two
    * metadata-scale offset tables, both ≤ b1·b2 rows.
    *
    * `grp` adds per-group semantics: spans, offsets and prefixes are
    * all additionally keyed by the group columns (the [[
    * graft.operators.Classify.aucExactBy]] face). Output = `t`'s
    * columns + `out` (the exclusive prefix, 0 for each (group-)minimum
    * tie-group).
    *
    * NULL-`sCol` rows are EXCLUDED — declared up front by the explicit
    * filter below, not left to the cell joins (width_bucket of NULL is
    * a NULL cell, which the inner joins would drop silently): a null
    * score has no rank, so it contributes to no prefix and to no
    * caller total. Callers whose totals must cover null-scored rows
    * (e.g. [[graft.operators.Classify.aucExact]]'s n_pos/n_neg) count
    * them separately or guarantee non-null scores by construction. */
  private[operators] def rangePrefixSum(t0: DataFrame, sCol: String,
      valCol: String, out: String, grp: Seq[String] = Nil,
      b1: Int = 64, b2: Int = 64, cutCells: Boolean = false): DataFrame = {
    require(b1 >= 1 && b2 >= 1, s"rangePrefixSum: b1,b2 >= 1, got $b1,$b2")
    // NOTE: t0 is read three times (span extremes, the cell fold, and
    // the final per-row prefix join) — a caller whose t0 derivation is
    // expensive (the AUC/top-fraction NB pipelines) must cut it first;
    // cutting HERE taxed the cheap callers (etl_row_range) more than
    // the recompute costs (r20 A/B). `cutCells` applies the same lesson
    // to the internal per-cell fold (r21, advice fix): the cellTot cut
    // is opt-in for callers whose cells derivation is expensive — an
    // unconditional cut created one persisted block per invocation,
    // freed only by the async ContextCleaner after GC, which is exactly
    // the serving-burst accumulation the fuzzy/ScaleBench work
    // previously diagnosed. Every current caller pre-cuts t0, so the
    // cellTot recompute reads a materialized frame and the default is
    // off.
    val t = t0.filter(col(sCol).isNotNull)
    val gCols = grp.map(col)
    val span =
      if (grp.isEmpty)
        t.agg(min(sCol).as("__lo"), max(sCol).as("__hi"))
      else t.groupBy(gCols: _*)
        .agg(min(sCol).as("__lo"), max(sCol).as("__hi"))
    val spanned =
      if (grp.isEmpty) t.crossJoin(broadcast(span))
      else t.join(span, grp) // AQE broadcasts the per-group extremes
    val cells = spanned
      .withColumn("__cell", width_bucket(col(sCol).cast("double"),
        col("__lo").cast("double"), col("__hi").cast("double") + 1,
        lit(b1 * b2)))
      .drop("__lo", "__hi")
      .withColumn("__b1", ((col("__cell") - 1L) / lit(b2.toLong)).cast("long"))
    val keyB1 = grp :+ "__b1"
    val keyCell = grp :+ "__cell"
    // level-2: per-cell totals, offset within the level-1 bucket
    // (≤ b2 rows per window partition)
    val cellTot0 = cells.groupBy((keyB1 :+ "__cell").map(col): _*)
      .agg(sum(valCol).as("__cn"))
    // feeds both offset levels; ≤ b1·b2 rows per group — cut only on
    // request (see the cutCells note above)
    val cellTot =
      if (cutCells) cellTot0.localCheckpoint(eager = false) else cellTot0
    val wCell = Window.partitionBy(keyB1.map(col): _*).orderBy("__cell")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellOff = cellTot
      .withColumn("__coff", coalesce(sum("__cn").over(wCell), lit(0L)))
      .select((keyCell :+ "__coff").map(col): _*)
    // level-1: bucket totals, global (per-group) exclusive offsets —
    // the ONLY partition-less fold, over ≤ b1 rows
    val wB =
      (if (grp.isEmpty) Window.orderBy("__b1")
       else Window.partitionBy(gCols: _*).orderBy("__b1"))
        .rowsBetween(Window.unboundedPreceding, -1)
    val bOff = cellTot.groupBy(keyB1.map(col): _*).agg(sum("__cn").as("__bn"))
      .withColumn("__boff", coalesce(sum("__bn").over(wB), lit(0L)))
      .select((keyB1 :+ "__boff").map(col): _*)
    // within-cell exclusive prefix — parallelism = b1·b2 cells
    val wLoc = Window.partitionBy(keyCell.map(col): _*).orderBy(sCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("__lnb", coalesce(sum(valCol).over(wLoc), lit(0L)))
      .join(if (grp.isEmpty) broadcast(cellOff) else cellOff, keyCell)
      .join(if (grp.isEmpty) broadcast(bOff) else bOff, keyB1)
      .withColumn(out, col("__boff") + col("__coff") + col("__lnb"))
      .drop("__cell", "__b1", "__coff", "__boff", "__lnb")
  }

  /** R2 — the reference's `--row-range "9001-9593"` manual shard slice
    * (`sam_segment_clip_pipeline.py:117-154,299-309`) as one declarative
    * op: global index (see [[globalRowIndex]]) then an index-range
    * filter. Any worker can take any contiguous slice of a 100 TB corpus
    * without a driver-side CSV split. */
  def rowRange(s: SparkSession, d: String): DataFrame =
    globalRowIndex(Tables.documents(s, d), col("doc_id"))
      .filter(col("global_idx").between(100, 299))
      .select("doc_id", "global_idx")
      .orderBy("doc_id")

  /** P6/P7 — URL → basename → stem (update_label_paths.py:7-16). */
  def urlFilename(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://archive.example.org/photos/"), col("source"),
      lit("/img_"), col("doc_id"), lit(".jpg"))
    val fname = regexp_extract(url, "([^/]+)$", 1)
    Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"), fname.as("filename"),
        regexp_replace(fname, "\\.[a-z]+$", "").as("stem"))
      .orderBy("doc_id")
  }

  /** P8/P12 — regex year extraction from a `dataset/YYYY/MM/...` path plus
    * decade binning (analyze_dataset_distribution.py:56-57,102). */
  def regexYear(s: SparkSession, d: String): DataFrame = {
    val path = concat(lit("dataset/"), year(col("o_orderdate")), lit("/"),
      lpad(month(col("o_orderdate")).cast("string"), 2, "0"),
      lit("/o_"), col("o_orderkey"), lit(".jpg"))
    val yr = regexp_extract(col("path"), "dataset/([0-9]{4})/", 1).cast("long")
    Tables.orders(s, d)
      .select(col("o_orderkey"), path.as("path"))
      .withColumn("yr", yr)
      .withColumn("decade", floor(col("yr") / 10) * 10)
      .orderBy("o_orderkey")
  }

  /** keyword dictionary shared with the oracle SQL (P9,
    * analyze_dataset_distribution.py:19-45's 60-entry location list). */
  val Keywords: Seq[String] = Seq("spark", "join", "filter", "window",
    "stream", "hash", "sort", "merge", "scan", "vector", "batch", "query")

  /** P9 — keyword containment over a dictionary: which of the 12 keywords
    * appear in each document (higher-order `filter`, no UDF). */
  def keywordMatch(s: SparkSession, d: String): DataFrame = {
    val matched = filter(array(Keywords.map(lit): _*), k => col("text").contains(k))
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_join(matched, ",").as("matched"),
        size(matched).cast("long").as("n_matched"))
      .orderBy("doc_id")
  }

  /** P16/P17 — extension-variant normalization + allowed-extension
    * predicate (update_elasticsearch_with_segments.py:138-162; app.py:31-35). */
  def extProbe(s: SparkSession, d: String): DataFrame = {
    val fname = concat(col("source"), lit("_"), col("doc_id"),
      element_at(array(lit(".jpg"), lit(".jpeg"), lit(".png"), lit(".txt")),
        (col("doc_id") % 4 + 1).cast("int")))
    Tables.documents(s, d)
      .select(col("doc_id"), fname.as("fname"))
      .withColumn("allowed", col("fname").rlike("\\.(png|jpg|jpeg|gif)$"))
      .withColumn("stem", regexp_replace(col("fname"), "\\.(jpg|jpeg|png)$", ""))
      .orderBy("doc_id")
  }

  /** S1/P5 — multi-format date parsing (the reference's ES date mapping
    * `yyyy-MM-dd HH:mm:ss||yyyy-MM-dd||epoch_millis`,
    * upload_features_to_elasticsearch.py:40, via
    * [[graft.sources.CsvSource.parseDate]]). The raw strings are derived
    * deterministically from `events.ts` — one third each format, plus an
    * unparseable sentinel on error rows — then re-parsed through the
    * fallback chain; output is the canonical second-resolution rendering
    * so the DuckDB oracle hash-compares exactly. */
  def dateMulti(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("event_type") === "error", lit("N/A")).otherwise(
      when(col("event_id") % 3 === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd"))
        .otherwise(unix_millis(col("ts")).cast("string")))
    Tables.events(s, d)
      .withColumn("raw", raw)
      .withColumn("parsed", graft.sources.CsvSource.parseDate(col("raw")))
      .select(col("event_id"), col("raw"),
        date_format(col("parsed"), "yyyy-MM-dd HH:mm:ss").as("parsed_str"),
        col("parsed").isNotNull.as("ok"))
      .orderBy("event_id")
  }

  /** S1+P1..P7 composed — the reference's flagship metadata-ETL chain as
    * ONE lineage (update_label_paths.py:62-104 → filter_label_paths.py:22-44
    * → clean_label_etiketler.py:34-77 → clean_and_fill_na.py:38-85):
    * url→filename, prefix split, cell cleanse, sentinel fill, safe cast.
    * The reference runs 4 scripts with CSV re-reads between them; here
    * Catalyst collapses the chain into a single codegen'd scan — the
    * filter lands before any string work on the pruned rows. */
  def labelChain(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://archive.example.org/photos/img_"),
      col("source"), lit("_"), col("doc_id"), lit(".jpg"))
    Tables.documents(s, d)
      .withColumn("url", url)
      .withColumn("filename", regexp_extract(col("url"), "([^/]+)$", 1))
      .withColumn("path", concat(lit("dataset/"), col("filename")))
      .filter(col("filename").startsWith("img_src1"))
      .withColumn("text_clean",
        when(col("text").contains("slow"), lit(""))
          .otherwise(substring(col("text"), 1, 40)))
      .withColumn("lang_filled",
        when(trim(col("lang")) === "" || col("lang").isin("zh"), lit("NA"))
          .otherwise(col("lang")))
      .withColumn("n_chars_int",
        graft.sources.CsvSource.safeInt(concat(col("n_chars"), lit(".0"))))
      .select("doc_id", "path", "filename", "text_clean", "lang_filled",
        "n_chars_int")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_date_multi" -> dateMulti,
    "etl_label_chain" -> labelChain,
    "etl_prefix_split" -> prefixSplit,
    "etl_cell_cleanse" -> cellCleanse,
    "etl_safe_cast" -> safeCast,
    "etl_hash_sample" -> hashSample,
    "etl_stratified_sample" -> stratifiedSample,
    "etl_group_sample" -> groupSampleQ,
    "etl_weighted_sample" -> weightedSampleQ,
    "etl_row_range" -> rowRange,
    "etl_url_filename" -> urlFilename,
    "etl_regex_year" -> regexYear,
    "etl_keyword_match" -> keywordMatch,
    "etl_ext_probe" -> extProbe)

  private val kwList = Keywords.map(k => s"'$k'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    "etl_date_multi" ->
      """WITH r AS (SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'N/A'
             WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
             WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m-%d')
             ELSE CAST(epoch_ms(ts) AS VARCHAR) END AS raw
           FROM events),
         p AS (SELECT event_id, raw,
           coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                    try_strptime(raw, '%Y-%m-%d'),
                    epoch_ms(TRY_CAST(raw AS BIGINT))) AS parsed
           FROM r)
         SELECT event_id, raw,
           strftime(parsed, '%Y-%m-%d %H:%M:%S') AS parsed_str,
           parsed IS NOT NULL AS ok
         FROM p ORDER BY event_id""",
    "etl_label_chain" ->
      """WITH u AS (SELECT doc_id, text, lang, n_chars,
           'https://archive.example.org/photos/img_' || source || '_' || doc_id || '.jpg' AS url
           FROM documents),
         f AS (SELECT *, regexp_extract(url, '([^/]+)$', 1) AS filename FROM u),
         k AS (SELECT * FROM f WHERE filename LIKE 'img_src1%')
         SELECT doc_id, 'dataset/' || filename AS path, filename,
           CASE WHEN contains(text, 'slow') THEN '' ELSE substr(text, 1, 40) END AS text_clean,
           CASE WHEN trim(lang) = '' OR lang IN ('zh') THEN 'NA' ELSE lang END AS lang_filled,
           CAST(TRY_CAST(n_chars || '.0' AS DOUBLE) AS BIGINT) AS n_chars_int
         FROM k ORDER BY doc_id""",
    "etl_prefix_split" ->
      "SELECT doc_id, source FROM documents WHERE source LIKE 'src1%' ORDER BY doc_id",
    "etl_cell_cleanse" ->
      """SELECT doc_id,
         CASE WHEN contains(text, 'slow') THEN '' ELSE substr(text, 1, 40) END AS text_clean,
         CASE WHEN trim(lang) = '' OR lang IN ('zh') THEN 'NA' ELSE lang END AS lang_filled
         FROM documents ORDER BY doc_id""",
    "etl_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
         ORDER BY doc_id""",
    "etl_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
           strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bkt
         FROM documents)
         SELECT doc_id, lang, CAST(bkt AS INT) AS bkt FROM b
         WHERE CASE WHEN lang = 'en' THEN bkt < 8 ELSE bkt < 4 END
         ORDER BY doc_id""",
    "etl_group_sample" -> {
      val hexU = Curation.hexUSql
      s"""WITH u AS (SELECT source, doc_id,
             (CAST($hexU AS DOUBLE) + 0.5) / 4294967296.0 AS u
           FROM (SELECT source, doc_id,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                 FROM documents WHERE doc_id IS NOT NULL)),
         r AS (SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
           FROM u)
         SELECT source, CAST(rn AS INT) AS rank, doc_id FROM r
         WHERE rn <= 3 ORDER BY source, rank"""
    },
    "etl_weighted_sample" -> {
      val hexU = Curation.hexUSql
      s"""WITH u AS (SELECT source, doc_id,
             -ln((CAST($hexU AS DOUBLE) + 0.5) / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS key
           FROM (SELECT source, doc_id, n_chars,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
                 FROM documents
                 WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                   AND n_chars > 0)),
         r AS (SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rn
           FROM u)
         SELECT source, CAST(rn AS INT) AS rank, doc_id FROM r
         WHERE rn <= 3 ORDER BY source, rank"""
    },
    "etl_row_range" ->
      """SELECT doc_id, global_idx FROM (
           SELECT doc_id,
             CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_idx
           FROM documents)
         WHERE global_idx BETWEEN 100 AND 299 ORDER BY doc_id""",
    "etl_safe_cast" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         nullif(event_type, 'error') AS etype_nullable,
         CAST(FLOOR(value) AS BIGINT) AS value_int
         FROM events ORDER BY event_id""",
    "etl_url_filename" ->
      """WITH u AS (SELECT doc_id,
           'https://archive.example.org/photos/' || source || '/img_' || doc_id || '.jpg' AS url
           FROM documents)
         SELECT doc_id, url,
           regexp_extract(url, '([^/]+)$', 1) AS filename,
           regexp_replace(regexp_extract(url, '([^/]+)$', 1), '\.[a-z]+$', '') AS stem
         FROM u ORDER BY doc_id""",
    "etl_regex_year" ->
      """WITH p AS (SELECT o_orderkey,
           'dataset/' || CAST(year(o_orderdate) AS INT) || '/' ||
           lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') || '/o_' || o_orderkey || '.jpg' AS path
           FROM orders)
         SELECT o_orderkey, path,
           CAST(regexp_extract(path, 'dataset/([0-9]{4})/', 1) AS BIGINT) AS yr,
           CAST(FLOOR(CAST(regexp_extract(path, 'dataset/([0-9]{4})/', 1) AS BIGINT) / 10) * 10 AS BIGINT) AS decade
         FROM p ORDER BY o_orderkey""",
    "etl_keyword_match" ->
      s"""SELECT doc_id,
          array_to_string(list_filter($kwList, k -> contains(text, k)), ',') AS matched,
          CAST(len(list_filter($kwList, k -> contains(text, k))) AS BIGINT) AS n_matched
          FROM documents ORDER BY doc_id""",
    "etl_ext_probe" ->
      """WITH f AS (SELECT doc_id,
           source || '_' || doc_id || (['.jpg', '.jpeg', '.png', '.txt'])[CAST(doc_id % 4 + 1 AS INT)] AS fname
           FROM documents)
         SELECT doc_id, fname,
           regexp_matches(fname, '\.(png|jpg|jpeg|gif)$') AS allowed,
           regexp_replace(fname, '\.(jpg|jpeg|png)$', '') AS stem
         FROM f ORDER BY doc_id""")
}
