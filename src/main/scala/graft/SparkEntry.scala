package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's named-query surface (the analog of the
  * reference's mode dispatch, `/root/reference/app.py:296-321`): every
  * operator family from SURVEY.md §2 is represented by at least one entry,
  * and every entry with SQL-expressible semantics has a DuckDB oracle in
  * `oracleSql` (same column names, deterministic ordering).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Retrieval.knnWhole(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Etl.queries ++ Analytics.queries ++ Retrieval.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Multimodal.queries ++
      Skew.queries ++ Joins.queries ++ Pipelines.queries ++ Curation.queries ++
      Lexical.queries ++ Sketches.queries ++ Classify.queries ++ GramIndex.queries ++
      GraphAnalytics.queries

  def oracleSql: Map[String, String] =
    Etl.oracleSql ++ Analytics.oracleSql ++ Retrieval.oracleSql ++
      TextAnalysis.oracleSql ++ Dedup.oracleSql ++ Multimodal.oracleSql ++
      Skew.oracleSql ++ Joins.oracleSql ++ Pipelines.oracleSql ++ Curation.oracleSql ++
      Lexical.oracleSql ++ Sketches.oracleSql ++ Classify.oracleSql ++ GramIndex.oracleSql ++
      GraphAnalytics.oracleSql

  /** Register every named query as a temp view over `sfDir`, alongside the
    * base tables — the complete engine surface from pure SQL:
    * `spark.sql("SELECT * FROM knn_whole")`. Every view is DEFERRED
    * ([[graft.plans.DeferredView]]): registration is a pure catalog
    * insert — no plan construction, no Spark job, sub-second for the
    * whole ~220-view surface (RegistrationSpec pins both) — and each
    * binding's construction (codebook collects, at-rest index builds,
    * Observations, checkpoints) runs at the FIRST query that resolves
    * the view, where a failure surfaces to the caller instead of a
    * stderr line and a silently missing view. Re-registering refreshes
    * every binding. */
  def registerQueryViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerTables(spark, sfDir)
    queries.foreach { case (name, fn) =>
      graft.plans.DeferredView.register(spark, name)(fn(spark, sfDir))
    }
  }
}
