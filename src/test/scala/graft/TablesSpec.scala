package graft

import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("typed accessors: schemas bind, filters still push to the scan") {
    val docs = Tables.documentsDs(spark, d)
    assert(docs.head().doc_id >= 0L)
    // typed filter by field still reaches the parquet scan as a pushed filter
    val q = Tables.embeddingsDs(spark, d).filter(col("vec_id") === 0)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,0)]"), scan)
    assert(q.head().embedding.nonEmpty)
    val ev = Tables.eventsDs(spark, d)
    assert(ev.head().ts != null)
  }

  test("registerQueryViews: every named query runs from pure SQL") {
    SparkEntry.registerQueryViews(spark, d)
    assert(spark.sql("SELECT * FROM knn_whole").count() === 10)
    assert(spark.sql(
      "SELECT * FROM txt_quality WHERE n_tokens > 0").count() > 0)
    assert(spark.sql("SELECT * FROM pipeline_curate_exact").count() > 0)
  }

  test("registerTables: whole corpus queryable from pure SQL") {
    Tables.registerTables(spark, d)
    val n = spark.sql(
      """SELECT count(*) FROM documents d
         JOIN embeddings e ON e.vec_id % 500 = d.doc_id % 500""").head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT max(ts) FROM events").head().getTimestamp(0) != null)
  }
}
