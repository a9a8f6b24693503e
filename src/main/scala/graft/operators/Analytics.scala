package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Analytics + join + top-k + set + window operators (SURVEY.md §2.3–2.6).
  *
  * The reference's analytics are pandas `value_counts`/`Counter` loops
  * (`/root/reference/analyze_dataset_distribution.py`) and its joins are
  * dict-build hash probes (`upload_features_to_elasticsearch.py:160-205`);
  * here each is one declarative plan so Catalyst gets partial aggregation,
  * broadcast-vs-shuffle join choice, and `TakeOrderedAndProject` top-k.
  *
  * Float determinism at any scale: every SUM over a non-integral double
  * column goes through DECIMAL(18,2/4) so the aggregate is exact and
  * order-independent (shuffle/merge order differs run to run on a real
  * cluster), then casts back to double to keep the published schema.
  */
object Analytics {

  /** Exact, order-independent sum of a 2-decimal money column. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // --- aggregations (A1–A9, A12–A13) ---------------------------------------

  /** A1 — value_counts per year (analyze_dataset_distribution.py:62). */
  def valueCounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"))
      .orderBy("yr")

  /** A2 — explode a multi-value string column and count values
    * (analyze_dataset_distribution.py:78-83). */
  def explodeCount(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy("tok")

  /** A3 — top-N of a count with deterministic tiebreak
    * (`most_common(15)`, analyze_dataset_distribution.py:82). */
  def topN(s: SparkSession, d: String): DataFrame =
    explodeCount(s, d).orderBy(desc("n"), asc("tok")).limit(15)

  /** A4 — min/max/mean/median stats per group
    * (analyze_dataset_distribution.py:98-99). l_quantity is
    * integral-valued so its double sum is exact in any order. */
  def stats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** A5 — exact distinct counts per group
    * (`nunique()`, analyze_dataset_distribution.py:337-358). */
  def distinctCount(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("c_nationkey")).as("n_nations"))
      .orderBy("c_mktsegment")

  /** A6 — fixed-width histogram (analyze_dataset_distribution.py:301). */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 25000).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")

  /** A7 — group-by mean over a 2-decimal double (exact via DECIMAL). */
  def groupMean(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg((moneySum(col("value")) / count(lit(1))).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** A8 — distribution of list lengths (tags-per-segment,
    * visualize_segmented_tags.py:202-204). */
  def lengthDist(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(size(split(col("text"), " ")).cast("long").as("n_toks"))
      .agg(count(lit(1)).as("n"))
      .orderBy("n_toks")

  /** A9 — boolean partition count (has-coords vs not,
    * analyze_dataset_distribution.py:252). */
  def nullPartition(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy((col("value") > 250).as("has_high"))
      .agg(count(lit(1)).as("n"))
      .orderBy("has_high")

  /** P12+A1 — decade binning (analyze_dataset_distribution.py:102). */
  def decade(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy((floor(year(col("o_orderdate")) / 10) * 10).as("decade"))
      .agg(count(lit(1)).as("n"))
      .orderBy("decade")

  // --- joins (J1–J5) --------------------------------------------------------

  /** J1 — features ⋈ metadata lookup join on the shared id
    * (upload_features_to_elasticsearch.py:160-205). Left outer keeps
    * unmatched feature rows exactly as the reference does. */
  def joinLookup(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .join(Tables.documents(s, d),
        col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("lang"), col("n_chars"))
      .orderBy("vec_id")

  /** J2 — existence (left-semi) join: parts that actually ship
    * (extract_clip_features.py:37-84's allow-set). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** anti variant of J2 (the reference's P2 complement filter):
    * customers with no order since 2000. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(year(col("o_orderdate")) >= 2000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** J1 at scale — multi-way star join + exact revenue rollup. nation and
    * supplier are dimension-sized → Catalyst broadcasts them; only the
    * lineitem aggregation shuffles (partial agg map-side first). */
  def joinMultiAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("n_name")

  /** J4 — point lookups by id batch (`ids: {values: [...]}`,
    * search_with_segments.py:364-378). */
  def joinPointLookup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")

  // --- top-k (T3/T4) --------------------------------------------------------

  /** T3 — global top-k with deterministic tiebreak; plans as
    * TakeOrderedAndProject (per-partition heap, no full sort). */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** T2 — per-group top-k via ranking window
    * (max_segments cap, sam_segment_clip_pipeline.py:361). */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "value", "rn")
      .orderBy("user_id", "rn")
  }

  /** A13 — deterministic argmax per group (best-match selection,
    * search_with_segments.py:264-267). */
  def argmaxPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_type", "event_id", "value")
      .orderBy("event_type")
  }

  // --- set ops (§2.6) -------------------------------------------------------

  private def custkeysOfYear(s: SparkSession, d: String, yr: Int): DataFrame =
    Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()

  /** EXCEPT — the reference's train/test complement split as a set op. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    custkeysOfYear(s, d, 1995).except(custkeysOfYear(s, d, 1996))
      .orderBy("o_custkey")

  def setIntersect(s: SparkSession, d: String): DataFrame =
    custkeysOfYear(s, d, 1995).intersect(custkeysOfYear(s, d, 1996))
      .orderBy("o_custkey")

  // --- windows / event-stream batch parity (§2.9 R4) ------------------------

  private def userW = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))

  /** Running sum per user in event-time order (DECIMAL accumulation:
    * left-to-right, exact, engine-independent). */
  def winRunningSum(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("run_sum",
        sum(col("value").cast(DecimalType(18, 2)))
          .over(userW.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select("user_id", "event_id", "run_sum")
      .orderBy("user_id", "event_id")

  /** lag/delta: inter-event gap per user in milliseconds. */
  def winLagDelta(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("delta_ms", col("ms") - lag("ms", 1).over(userW))
      .select("user_id", "event_id", "delta_ms")
      .orderBy("user_id", "event_id")

  /** NTILE quartiles — each user's events bucketed into value quartiles
    * (windowed ranking family beyond row_number/lag). */
  def winNtile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("quartile",
        ntile(4).over(Window.partitionBy("user_id").orderBy(asc("value"), asc("event_id"))))
      .groupBy("user_id", "quartile")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy("user_id", "quartile")

  /** Hour-over-hour retention — distinct users active in hour h who are
    * also active in h+1 (self-join on the hour grid; the engagement
    * metric every event pipeline ends up computing). */
  def evtRetention(s: SparkSession, d: String): DataFrame = {
    val hours = Tables.events(s, d)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h")).distinct()
    hours.as("a")
      .join(hours.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.h") === col("a.h") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("a.h").as("h"))
      .agg(countDistinct(col("a.user_id")).as("retained"))
      .orderBy("h")
  }

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click AFTER it, and the first purchase after
    * THAT — both follow-ups inside a 24 h window from the first view
    * (the product-analytics query every event warehouse serves).
    *
    * Shape at scale: three aggregations + two joins, ALL keyed on
    * `user_id` — co-partitioned, so after the first exchange the rest
    * reuse the partitioning; each stage's `event_type` filter is pushed
    * to the parquet scan, so the corpus is read as three narrow
    * type-pruned passes, never shuffled whole. No window-over-user sort
    * (the naive spelling) and no per-user event-list collect (unbounded
    * state at 100 TB). */
  def evtFunnel(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d), "view", "click", "purchase",
      "INTERVAL 24 HOURS")

  /** Per-user stage times behind [[funnel]]: (user_id, t1, t2, t3) with
    * t2/t3 null where the user never reached the step. Exposed so the
    * streaming arm ([[graft.streaming.Streams.funnelIngest]]) can
    * recompute stages over its retained-event state with the SAME
    * definition the batch query uses. */
  def funnelStages(e: DataFrame, step1: String, step2: String,
      step3: String, winExpr: String): DataFrame = {
    val win = expr(winExpr)
    val t1 = e.filter(col("event_type") === step1)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = e.filter(col("event_type") === step2)
      .join(t1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val t3 = e.filter(col("event_type") === step3)
      .join(t2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.join(t2.select("user_id", "t2"), Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select("user_id", "t1", "t2", "t3")
  }

  /** The funnel operator behind [[evtFunnel]], parameterized on the three
    * ordered step types and the completion window (anchored at step 1). */
  def funnel(e: DataFrame, step1: String, step2: String, step3: String,
      winExpr: String): DataFrame =
    funnelStages(e, step1, step2, step3, winExpr)
      .agg(count("t1").as("c1"), count("t2").as("c2"), count("t3").as("c3"))
      .select(expr(s"stack(3, 1, '$step1', c1, 2, '$step2', c2, " +
        s"3, '$step3', c3) AS (step, stage, users)"))
      .orderBy("step")

  /** Tumbling-window counts + exact sums per (hour, type) — the batch
    * equivalent of the streaming ingest rollup (SRS §4.6 digests). */
  def evtTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy("h", "event_type")

  /** Data-profiling sweep — per-column null count, distinct count, min and
    * max for the orders table, all columns in ONE scan: the stack/unpivot
    * trick turns N per-column jobs into a single aggregate (at 100 TB a
    * profile that scans once instead of once per column is the difference
    * between minutes and hours). */
  def profile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    // Two legs instead of one exploded groupBy (r20): min(string) /
    // max(string) aggregation buffers are not UnsafeRow-mutable, so the
    // single-pass spelling fell off HashAggregate onto SortAggregate —
    // three full sorts of the 4·|orders| exploded strings at sf0.1.
    // Leg 1 computes count/nulls/min/max per column in ONE keyless pass
    // over orders (no explode, no sort — a global agg needs no hash
    // map); leg 2 keeps the exploded shape only for the distinct count,
    // where both stages are codegen hash aggregates (long buffers).
    // Same values, same schema (A/B at sf0.1: 2.77 → 1.00 s).
    val glob = o.agg(count(lit(1)).as("__n"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))): _*)
    val base = glob.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_null"), col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"))): _*)).as("s"))
      .select(col("s.*"))
    val nd = o.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.col_name"), col("s.v")).distinct()
      .groupBy("col_name").agg(count(col("v")).as("n_distinct"))
    base.join(nd, "col_name")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  /** Per-group quantiles over any numeric column. `exact = true` uses
    * Spark's `percentile` (true interpolated quantiles; per-group memory
    * grows with DISTINCT values — fine up to ~10⁷ distinct per group,
    * and bit-exact against DuckDB's `quantile_cont`, which is what the
    * oracle checks). `exact = false` routes to `approx_percentile`
    * (mergeable bounded-memory sketch — the 100 TB path, where an exact
    * per-group value map would not fit an executor; rank error ≤
    * 1/accuracy). Same shuffle shape either way: one partial-aggregated
    * groupBy, sketch/map merged map-side. */
  def quantiles(df: DataFrame, group: Column, value: Column,
      probs: Seq[Double], exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    val ps = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val v = value.cast("double")
    val q =
      if (exact) expr(s"percentile(__v, $ps)")
      else expr(s"approx_percentile(__v, $ps, $accuracy)")
    df.withColumn("__v", v)
      .groupBy(group.as("grp"))
      .agg(q.as("qs"))
      .select(Seq(col("grp")) ++ probs.zipWithIndex.map { case (p, i) =>
        col("qs").getItem(i).as(s"p${(p * 100).round}")
      }: _*)
  }

  def aggQuantiles(s: SparkSession, d: String): DataFrame =
    quantiles(Tables.orders(s, d), col("o_orderstatus"), col("o_totalprice"),
      probs = Seq(0.5, 0.9, 0.99))
      .withColumnRenamed("grp", "o_orderstatus")
      .orderBy("o_orderstatus")

  /** ROLLUP aggregation — (year, month) order counts with subtotals per
    * year and a grand total. The reference has no grouping-sets notion
    * (SURVEY.md §2.4); Spark's rollup is a single pass emitting all
    * grouping levels (one Expand + one aggregate, not three jobs). */
  /** Bivariate dependence stats per group — corr/covariance/stddevs in ONE
    * grouped pass. Both engines use centered (Welford-merged) co-moment
    * aggregates, which avoid the catastrophic cancellation of the naive
    * E[xy]−E[x]E[y] sums — that is what keeps the cross-engine values
    * equal at 6 decimals; map-side partial co-moments merge
    * associatively, so the shuffle carries one small state per
    * (partition, group). */
  def corrStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("covar_qty_price"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"))
      .orderBy("l_returnflag")

  def rollupCounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("yr"), asc_nulls_first("mo"))

  /** SLIDING-window counts (1-hour window, 30-minute slide): every event
    * lands in exactly 2 overlapping windows. Spark's `window()` generator
    * expands the assignment inline (no self-join); the oracle reproduces
    * it by unnesting the two window starts per event. */
  def evtSliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")

  /** Gap-based sessionization (30 min): new-session flag via lag, session
    * id via running sum — the standard shuffle-once formulation (both
    * windows share one partitioning, so Spark sorts each user partition
    * once and pipelines the two window operators). */
  def evtSession(s: SparkSession, d: String): DataFrame = {
    val gapMs = 30L * 60 * 1000
    val newSession = when(lag("ms", 1).over(userW).isNull
      || col("ms") - lag("ms", 1).over(userW) > gapMs, 1L).otherwise(0L)
    Tables.events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("new_s", newSession)
      .withColumn("sid",
        sum("new_s").over(userW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max("sid").as("n_sessions"), count(lit(1)).as("n_events"),
        (count(lit(1)) / max("sid").cast("double")).as("events_per_session"))
      .orderBy("user_id")
  }

  /** JSON extraction + modular bucket rollup (S7-adjacent: the reference's
    * per-image JSON side files become a queryable column). */
  def evtJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy((get_json_object(col("props"), "$.k").cast("long") % 10).as("kmod"))
      .agg(count(lit(1)).as("n"))
      .orderBy("kmod")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_value_counts" -> valueCounts,
    "agg_explode_count" -> explodeCount,
    "agg_topn" -> topN,
    "agg_stats" -> stats,
    "agg_distinct" -> distinctCount,
    "agg_histogram" -> histogram,
    "agg_group_mean" -> groupMean,
    "agg_length_dist" -> lengthDist,
    "agg_null_partition" -> nullPartition,
    "agg_decade" -> decade,
    "join_lookup" -> joinLookup,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_multi_agg" -> joinMultiAgg,
    "join_point_lookup" -> joinPointLookup,
    "topk_orders" -> topkOrders,
    "topk_per_group" -> topkPerGroup,
    "argmax_per_group" -> argmaxPerGroup,
    "set_except" -> setExcept,
    "set_intersect" -> setIntersect,
    "win_running_sum" -> winRunningSum,
    "win_lag_delta" -> winLagDelta,
    "agg_rollup" -> rollupCounts,
    "agg_corr" -> corrStats,
    "agg_profile" -> profile,
    "agg_quantiles" -> aggQuantiles,
    "evt_tumbling" -> evtTumbling,
    "evt_sliding" -> evtSliding,
    "win_ntile" -> winNtile,
    "evt_retention" -> evtRetention,
    "evt_funnel" -> evtFunnel,
    "evt_session" -> evtSession,
    "evt_json" -> evtJson)

  val oracleSql: Map[String, String] = Map(
    "agg_value_counts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n
         FROM orders GROUP BY yr ORDER BY yr""",
    "agg_explode_count" ->
      """SELECT tok, count(*) AS n
         FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part)
         GROUP BY tok ORDER BY tok""",
    "agg_topn" ->
      """SELECT tok, count(*) AS n
         FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part)
         GROUP BY tok ORDER BY n DESC, tok LIMIT 15""",
    "agg_stats" ->
      """SELECT l_returnflag,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           sum(l_quantity) / count(*) AS avg_qty,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_distinct" ->
      """SELECT c_mktsegment, count(*) AS n,
           count(DISTINCT c_nationkey) AS n_nations
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin, count(*) AS n
         FROM orders GROUP BY bin ORDER BY bin""",
    "agg_group_mean" ->
      """SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
           count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "agg_length_dist" ->
      """SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks, count(*) AS n
         FROM documents GROUP BY n_toks ORDER BY n_toks""",
    "agg_null_partition" ->
      """SELECT value > 250 AS has_high, count(*) AS n
         FROM events GROUP BY has_high ORDER BY has_high""",
    "agg_decade" ->
      """SELECT CAST(FLOOR(year(o_orderdate) / 10) * 10 AS BIGINT) AS decade, count(*) AS n
         FROM orders GROUP BY decade ORDER BY decade""",
    "join_lookup" ->
      """SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, d.lang, d.n_chars
         FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id
         ORDER BY e.vec_id""",
    "join_semi" ->
      """SELECT p_brand, count(*) AS n FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         GROUP BY p_brand ORDER BY p_brand""",
    "join_anti" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND year(o_orderdate) >= 2000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_multi_agg" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "join_point_lookup" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
         WHERE o_orderkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
         ORDER BY o_orderkey""",
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "topk_per_group" ->
      """SELECT user_id, event_id, value, rn FROM (
           SELECT user_id, event_id, value,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
           FROM events)
         WHERE rn <= 3 ORDER BY user_id, rn""",
    "argmax_per_group" ->
      """SELECT event_type, event_id, value FROM (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY event_type""",
    "set_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         ORDER BY o_custkey""",
    "set_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         ORDER BY o_custkey""",
    "win_running_sum" ->
      """SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
         FROM events ORDER BY user_id, event_id""",
    "win_lag_delta" ->
      """SELECT user_id, event_id,
           epoch_ms(ts) - lag(epoch_ms(ts), 1)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_ms
         FROM events ORDER BY user_id, event_id""",
    "evt_tumbling" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY h, event_type ORDER BY h, event_type""",
    "agg_profile" ->
      """WITH s AS (
           SELECT col_name, v FROM (
             SELECT unnest(['o_orderkey', 'o_custkey', 'o_orderstatus', 'o_totalprice']) AS col_name,
                    unnest([CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
                            CAST(o_orderstatus AS VARCHAR), CAST(o_totalprice AS VARCHAR)]) AS v
             FROM orders))
         SELECT col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT v) AS n_distinct,
           min(v) AS min_str, max(v) AS max_str
         FROM s GROUP BY col_name ORDER BY col_name""",
    "agg_quantiles" ->
      """SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_rollup" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo, count(*) AS n
         FROM orders GROUP BY ROLLUP (yr, mo)
         ORDER BY yr NULLS FIRST, mo NULLS FIRST""",
    "agg_corr" ->
      """SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(stddev_samp(l_extendedprice), 6) AS sd_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "win_ntile" ->
      """WITH q AS (SELECT user_id, value,
           ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS quartile
         FROM events)
         SELECT user_id, quartile, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM q GROUP BY user_id, quartile ORDER BY user_id, quartile""",
    "evt_retention" ->
      """WITH hrs AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events)
         SELECT a.h, count(DISTINCT a.user_id) AS retained
         FROM hrs a JOIN hrs b
           ON a.user_id = b.user_id AND b.h = a.h + INTERVAL 1 HOUR
         GROUP BY a.h ORDER BY a.h""",
    "evt_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         t2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1.t1) AS t1
             FROM events e JOIN t1 ON e.user_id = t1.user_id
             WHERE e.event_type = 'click' AND e.ts > t1.t1
               AND e.ts <= t1.t1 + INTERVAL 24 HOUR
             GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, min(e.ts) AS t3
             FROM events e JOIN t2 ON e.user_id = t2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > t2.t2
               AND e.ts <= t2.t1 + INTERVAL 24 HOUR
             GROUP BY e.user_id)
         SELECT * FROM (
           SELECT CAST(1 AS INT) AS step, 'view' AS stage, count(*) AS users FROM t1
           UNION ALL
           SELECT CAST(2 AS INT), 'click', count(*) FROM t2
           UNION ALL
           SELECT CAST(3 AS INT), 'purchase', count(*) FROM t3)
         ORDER BY step""",
    "evt_sliding" ->
      """WITH sw AS (
           SELECT event_type,
             time_bucket(INTERVAL 30 MINUTE, ts) - unnest([INTERVAL 0 MINUTE, INTERVAL 30 MINUTE]) AS ws
           FROM events)
         SELECT ws, event_type, count(*) AS n
         FROM sw GROUP BY ws, event_type ORDER BY ws, event_type""",
    "evt_session" ->
      """WITH x AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         y AS (
           SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM x)
         SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions,
           count(*) AS n_events,
           count(*) / CAST(MAX(sid) AS DOUBLE) AS events_per_session
         FROM y GROUP BY user_id ORDER BY user_id""",
    "evt_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
           count(*) AS n
         FROM events GROUP BY kmod ORDER BY kmod""")
}
