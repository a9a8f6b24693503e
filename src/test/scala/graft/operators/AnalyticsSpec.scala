package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch analytics operators with nontrivial per-user semantics —
  * currently the ordered conversion funnel. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Double): Timestamp =
    new Timestamp(1704067200000L + (h * 3600 * 1000).toLong) // 2024-01-01 + h

  test("funnel: ordering is strict, window anchors at step 1, steps nest") {
    // u1 completes in order; u2's click misses the 24 h window; u3's
    // first click PRECEDES its first view (must not count) but a later
    // one qualifies, while its purchase precedes the qualifying click
    // (must not count); u4 never views (invisible to every step).
    val e = Seq(
      (1L, "view", 0.0), (1L, "click", 1.0), (1L, "purchase", 2.0),
      (2L, "view", 0.0), (2L, "click", 25.0), (2L, "purchase", 26.0),
      (3L, "click", 0.5), (3L, "view", 1.0), (3L, "purchase", 1.5),
      (3L, "click", 2.0),
      (4L, "click", 0.0), (4L, "purchase", 1.0))
      .map { case (u, t, h) => (u, t, ts(h)) }
      .toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel(e, "view", "click", "purchase", "INTERVAL 24 HOURS")
      .as[(Int, String, Long)].collect().toSeq
    assert(r === Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: step-1 boundary — follow-up exactly at t1 + window counts, t1 itself doesn't") {
    val e = Seq(
      (1L, "view", 0.0), (1L, "click", 24.0),     // inclusive upper bound
      (2L, "view", 0.0), (2L, "click", 0.0))      // strict lower bound (same instant)
      .map { case (u, t, h) => (u, t, ts(h)) }
      .toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel(e, "view", "click", "purchase", "INTERVAL 24 HOURS")
      .as[(Int, String, Long)].collect().toSeq
    assert(r === Seq((1, "view", 2L), (2, "click", 1L), (3, "purchase", 0L)))
  }

  test("evt_funnel: real testdata — counts are monotone non-increasing and step 1 positive") {
    val r = Analytics.evtFunnel(spark, "/root/testdata/sf0.001")
      .as[(Int, String, Long)].collect().toSeq
    assert(r.map(_._1) === Seq(1, 2, 3))
    assert(r.head._3 > 0L)
    assert(r.sliding(2).forall { case Seq(a, b) => b._3 <= a._3 })
  }
}
