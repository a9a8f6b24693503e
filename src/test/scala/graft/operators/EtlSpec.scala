package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Etl generic APIs with behavior not already pinned by the oracle gate. */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowIndex: matches the flat-window row_number on a skewed id span") {
    // i³ ids: the top bucket holds most of the span but few rows — bucket
    // balance degrades, the contiguous 0-based index must not.
    val df = (1L to 400L).map(i => (i * i * i, s"r$i")).toDF("id", "payload")
    val got = Etl.globalRowIndex(df, $"id", buckets = 8)
      .select("id", "global_idx").as[(Long, Long)].collect().sortBy(_._1)
    val want = df
      .withColumn("global_idx", row_number().over(Window.orderBy("id")).cast("long") - 1L)
      .select("id", "global_idx").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("globalRowIndex: row_number window fans out per bucket, not one task") {
    val df = (1L to 1000L).map(i => (i, i % 5)).toDF("id", "v")
    val m = Etl.globalRowIndex(df, $"id", buckets = 8)
    val plan = m.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(__bkt#\\d+".r.findFirstIn(plan).isDefined,
      s"expected per-bucket hash partitioning in:\n$plan")
  }

  test("globalRowIndex: single-row and single-bucket degenerate inputs") {
    val one = Etl.globalRowIndex(Seq((7L, "x")).toDF("id", "p"), $"id")
      .select("global_idx").as[Long].collect()
    assert(one === Array(0L))
    val same = Etl.globalRowIndex((1L to 5L).map((_, "y")).toDF("id", "p"), $"id", buckets = 1)
      .orderBy("id").select("global_idx").as[Long].collect()
    assert(same === Array(0L, 1L, 2L, 3L, 4L))
  }
}
