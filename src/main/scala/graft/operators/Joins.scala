package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-aligned join utilities — the operator family Spark's DataFrame API
  * lacks natively (the classic "custom operator" candidates; absent from
  * the reference too — SURVEY.md §2.3 "No sort-merge/range/as-of joins" —
  * so this is green-field scale surface, not parity). Built by
  * COMPOSITION per the preference order (SURVEY.md §7.3 / spark guide):
  * the union + running-window formulation is a single shuffle on the join
  * keys and needs no custom LogicalPlan/Strategy, no per-row subqueries,
  * and no range-explode — the shape that scales to misaligned event
  * streams at 100 TB.
  */
object Joins {

  /** AS-OF (backward) join: for every left row, the most recent right row
    * with `rightTs ≤ leftTs` in the same key group.
    *
    * Mechanics: tag both sides, union by name, ONE window pass per key
    * ordered by (ts, side, tiebreak) carrying `last(right-payload,
    * ignoreNulls)` and a running right-row count, then keep left rows.
    * Right rows at the same timestamp as a left row sort first (side 0 <
    * 1) ⇒ inclusive ≤ semantics; `tiebreak` makes equal-timestamp right
    * rows deterministic.
    *
    * Output: left.* + `asof_<c>` for each requested right column +
    * `n_prior` (how many right rows preceded). Unmatched left rows get
    * NULLs and n_prior = 0 (left-outer semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn("_rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightVals.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val r = right
      .withColumn("_t", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(tiebreak))
      .withColumn("_rv", struct(rightVals.map(col): _*))
      .select((keys ++ Seq("_t", "_side", "_tb", "_rv")).map(col): _*)
    val unioned = l.select((keys ++ Seq("_t", "_side", "_tb", "_rv")).map(col)
      ++ leftCols.filterNot(keys.contains).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("_last_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("n_prior", sum(when(col("_side") === 0, 1L).otherwise(0L)).over(w))
      .filter(col("_side") === 1)
    rightVals.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", col("_last_rv").getField(c))
    }.select((leftCols ++ rightVals.map(c => s"asof_$c") :+ "n_prior").map(col): _*)
  }

  /** RANGE (interval-containment) join with NO equi key: match every
    * point row to every interval row with `start ≤ ts ≤ end`.
    *
    * A naive theta-join is |points|×|intervals|; instead both sides are
    * binned to fixed-width time buckets — intervals explode into one row
    * per overlapped bucket — and the join becomes an EQUI-join on the
    * bucket plus an exact containment filter. Shuffle volume is
    * O(points + Σ interval-spans/binWidth); a (point, interval) pair can
    * only meet in the point's own bucket, so no dedup is needed.
    * `binWidthSec` should be on the order of the typical interval length
    * (too small explodes intervals, too large inflates bucket fan-in). */
  def rangeJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidthSec: Long = 3600L): DataFrame = {
    val p = points.withColumn("_bin",
      floor(unix_timestamp(col(pointTs)) / binWidthSec))
    val iv = intervals.withColumn("_bin", explode(sequence(
      floor(unix_timestamp(col(startCol)) / binWidthSec),
      floor(unix_timestamp(col(endCol)) / binWidthSec))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("_bin")
  }

  /** Oracle-checked binding for [[rangeJoin]]: one 2-hour window per user
    * (anchored at their first event), counting ALL events — any user —
    * that fall inside it. No equi key: a genuine interval join. */
  def rangeEventWindows(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val windows = ev.groupBy("user_id")
      .agg(min("ts").as("w_start"))
      .withColumn("w_end", col("w_start") + expr("INTERVAL 2 HOURS"))
    rangeJoin(ev.select(col("ts"), col("event_id")), "ts",
        windows, "w_start", "w_end")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy("user_id")
  }

  /** Oracle-checked binding: each click event joined to the user's most
    * recent preceding error event. */
  def asofClickError(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
    asOf(clicks, errors, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "err_ts",
      rightVals = Seq("err_ts"), tiebreak = "err_id")
      .select(col("event_id"), col("user_id"),
        col("asof_err_ts").as("last_error_ts"),
        col("n_prior").as("errors_so_far"))
      .orderBy("event_id")
  }

  /** Interval-OVERLAP join (no equi key): every (a, b) pair whose closed
    * intervals intersect — `aStart ≤ bEnd AND bStart ≤ aEnd`.
    *
    * Same banding as [[rangeJoin]], but BOTH sides explode to their
    * covered buckets, so an overlapping pair meets in every shared
    * bucket. Instead of a distinct-shuffle dedup, each pair is kept only
    * in its FIRST common bucket — `bin == floor(max(aStart, bStart) /
    * width)`, an O(1) predicate on columns already in hand — so output
    * rows are emitted exactly once and nothing re-shuffles. Shuffle
    * volume is O(Σ interval-spans / binWidth), never |a|×|b|. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidthSec: Long = 3600L): DataFrame = {
    def bins(df: DataFrame, s: String, e: String) =
      df.withColumn("_bin", explode(sequence(
        floor(unix_timestamp(col(s)) / binWidthSec),
        floor(unix_timestamp(col(e)) / binWidthSec))))
    bins(a, aStart, aEnd).join(bins(b, bStart, bEnd), Seq("_bin"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("_bin") === floor(
        greatest(unix_timestamp(col(aStart)), unix_timestamp(col(bStart)))
          / binWidthSec))
      .drop("_bin")
  }

  /** Oracle-checked binding for [[intervalOverlap]]: each user's click
    * window (first click + 2h) against every user's error window (first
    * error + 2h) — the "whose incidents co-occur with whose activity"
    * correlation, a genuine interval×interval join with no equi key. */
  def intervalClickErrorOverlap(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def win(t: String, pfx: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id").as(s"${pfx}_user"))
      .agg(min("ts").as(s"${pfx}_start"))
      .withColumn(s"${pfx}_end", col(s"${pfx}_start") + expr("INTERVAL 2 HOURS"))
    intervalOverlap(win("click", "c"), "c_start", "c_end",
        win("error", "e"), "e_start", "e_end")
      .select("c_user", "e_user")
      .orderBy("c_user", "e_user")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof" -> asofClickError,
    "join_range" -> rangeEventWindows,
    "join_interval" -> intervalClickErrorOverlap)

  val oracleSql: Map[String, String] = Map(
    "join_asof" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         e AS (SELECT user_id, ts AS ets FROM events WHERE event_type = 'error')
         SELECT c.event_id, c.user_id,
           max(e.ets) AS last_error_ts,
           count(e.ets) AS errors_so_far
         FROM c LEFT JOIN e ON e.user_id = c.user_id AND e.ets <= c.ts
         GROUP BY c.event_id, c.user_id
         ORDER BY c.event_id""",
    // the oracle states overlap directly as the theta join the banded
    // plan avoids
    "join_interval" ->
      """WITH c AS (SELECT user_id AS c_user, min(ts) AS c_start,
             min(ts) + INTERVAL 2 HOUR AS c_end
           FROM events WHERE event_type = 'click' GROUP BY user_id),
         e AS (SELECT user_id AS e_user, min(ts) AS e_start,
             min(ts) + INTERVAL 2 HOUR AS e_end
           FROM events WHERE event_type = 'error' GROUP BY user_id)
         SELECT c_user, e_user FROM c JOIN e
           ON c_start <= e_end AND e_start <= c_end
         ORDER BY c_user, e_user""",
    "join_range" ->
      """WITH w AS (
           SELECT user_id, min(ts) AS w_start, min(ts) + INTERVAL 2 HOUR AS w_end
           FROM events GROUP BY user_id)
         SELECT w.user_id, count(*) AS n_in_window
         FROM w JOIN events e ON e.ts >= w.w_start AND e.ts <= w.w_end
         GROUP BY w.user_id ORDER BY w.user_id""")
}
