package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation utilities (the 100 TB concern SURVEY.md §7.1 calls out:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge skew automatically; these are the
  * explicit forms for when the plan must not depend on runtime stats —
  * e.g. a hot-key aggregation whose single reducer would spill, or a
  * shuffle join against a dim too big to broadcast where one key owns 10%
  * of the fact table.
  *
  * Salts are DETERMINISTIC (xxhash64 of the full row, mod nSalts), not
  * `rand()`: retries and speculative tasks must land a row on the same
  * salt or the result changes under failure.
  */
object Skew {

  private def rowSalt(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(nSalts.toLong))

  /** Two-phase salted aggregation: count/sum per (key, salt) first — so a
    * hot key's rows split across `nSalts` reducers — then merge partials
    * per key. Result ≡ `df.groupBy(keys).agg(count, sum)`. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      nSalts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", rowSalt(df, nSalts))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("_n").as("n"), sum("_s").as(s"sum_$valueCol"))
  }

  /** Salted shuffle join for a skewed fact ⋈ non-broadcastable dim:
    * the fact side gets a deterministic salt in [0, nSalts); the dim side
    * is replicated nSalts× with an exploded salt column; the join key
    * becomes (key, salt), so one hot key spreads over nSalts reducers at
    * the cost of nSalts× the dim shuffle volume. Result ≡ plain inner
    * equi-join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", rowSalt(fact, nSalts))
    val repDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    saltedFact.join(repDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Oracle-checked demonstration: per-user event count+sum through the
    * salted two-phase path — the oracle is the PLAIN group-by, proving
    * result equivalence, while the plan shows the (key, salt) pre-shuffle. */
  def saltedEventCounts(s: SparkSession, d: String): DataFrame =
    saltedCountSum(
      Tables.events(s, d).select(col("user_id"),
        col("value").cast("decimal(18,2)").as("value")),
      Seq("user_id"), "value", nSalts = 16)
      .select(col("user_id"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_salted_count" -> saltedEventCounts)

  val oracleSql: Map[String, String] = Map(
    "agg_salted_count" ->
      """SELECT user_id, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id""")
}
