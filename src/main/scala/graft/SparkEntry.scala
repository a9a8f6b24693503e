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
    * `spark.sql("SELECT * FROM knn_whole")`. Views are lazy — nothing runs
    * until queried — except the few bindings that materialize an index or
    * an Observation during CONSTRUCTION (`knn_ivfpq*` builds/caches the
    * at-rest index, `pipeline_curate_counters` runs the observed job to
    * read its accumulators, `graph_pagerank_refined`/`graph_pagerank_del`
    * build/copy the per-JVM graph layout, `graph_quality_prop*` cut the
    * NB lineage with an eager localCheckpoint). */
  def registerQueryViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerTables(spark, sfDir)
    // per-view isolation: one binding failing to CONSTRUCT (e.g. an
    // eager index build hitting an unwritable scratch dir) must not
    // abort registration of the other ~125 views
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).createOrReplaceTempView(name)
      catch { case e: Exception =>
        System.err.println(s"[graft] view '$name' not registered: ${e.getMessage}")
      }
    }
  }
}
