package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("asOf: backward inclusive match, tiebreak, unmatched nulls, running count") {
    val left = Seq(
      (1L, 10L, ts(5)),   // after r1/r2 (same ts!) → tiebreak picks rid 2
      (2L, 10L, ts(10)),  // exactly AT r3's ts → inclusive ≤ matches r3
      (3L, 10L, ts(1)),   // before any right row → nulls, n_prior 0
      (4L, 20L, ts(9))    // other key, single right row at ts 7
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 10L, ts(3), "a"),
      (2L, 10L, ts(3), "b"),  // same ts as rid 1 → deterministic by rid
      (3L, 10L, ts(10), "c"),
      (4L, 20L, ts(7), "d"),
      (5L, 30L, ts(0), "e")   // key with no left rows
    ).toDF("rid", "k", "rt", "v")

    val out = Joins.asOf(left, right, keys = Seq("k"),
      leftTs = "t", rightTs = "rt", rightVals = Seq("v", "rt"), tiebreak = "rid")
      .select("id", "asof_v", "n_prior")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1).toSeq

    assert(out === Seq(
      (1L, Some("b"), 2L),   // both ts(3) rows precede; last by rid = "b"
      (2L, Some("c"), 3L),   // inclusive at equal timestamp
      (3L, None, 0L),
      (4L, Some("d"), 1L)))
  }

  test("asOf: composite keys partition the timeline independently") {
    val left = Seq((1L, "a", 1L, ts(10)), (2L, "a", 2L, ts(10)), (3L, "b", 1L, ts(10)))
      .toDF("id", "k1", "k2", "t")
    val right = Seq(
      (1L, "a", 1L, ts(5), "a1"), (2L, "a", 2L, ts(6), "a2"), (3L, "b", 9L, ts(7), "b9"))
      .toDF("rid", "k1", "k2", "rt", "v")
    val out = Joins.asOf(left, right, keys = Seq("k1", "k2"),
      leftTs = "t", rightTs = "rt", rightVals = Seq("v"), tiebreak = "rid")
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a1"), 2L -> Some("a2"), 3L -> None))
  }

  test("rangeJoin: binned interval join equals brute-force theta join") {
    val points = (0 until 200).map(i => (i.toLong, ts(i))).toDF("pid", "t")
    val intervals = Seq(
      (1L, ts(10), ts(25)),   // 16 points
      (2L, ts(24), ts(30)),   // overlapping interval
      (3L, ts(300), ts(310)), // empty
      (4L, ts(58), ts(62))    // spans a bin boundary (60-min bins)
    ).toDF("iid", "s", "e")
    val binned = Joins.rangeJoin(points, "t", intervals, "s", "e", binWidthSec = 3600L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.join(intervals, $"t" >= $"s" && $"t" <= $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned === brute)
    assert(brute.count(_._2 == 1L) === 16)
    assert(!brute.exists(_._2 == 3L))
  }

  test("asOf binding matches a brute-force computation on real events") {
    val d = "/root/testdata/sf0.001"
    val out = Joins.asofClickError(spark, d)
      .as[(Long, Long, Option[Timestamp], Long)].collect()
    assert(out.nonEmpty)
    // brute force for a handful of rows
    val ev = graft.Tables.events(spark, d)
      .select("event_id", "user_id", "ts", "event_type")
      .as[(Long, Long, Timestamp, String)].collect()
    val errors = ev.filter(_._4 == "error")
    out.take(20).foreach { case (eid, uid, lastErr, n) =>
      val click = ev.find(_._1 == eid).get
      val prior = errors.filter(e => e._2 == uid && !e._3.after(click._3))
      assert(n === prior.length, s"event $eid prior-error count")
      assert(lastErr === prior.sortBy(_._3.getTime).lastOption.map(_._3), s"event $eid")
    }
  }

  test("intervalOverlap: exact-once emission across shared buckets, closed boundaries") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // a1 spans 5 hours (6 buckets); b1 overlaps it across 4 shared
    // buckets — the pair must come back exactly ONCE. b2 touches a1 at a
    // single instant (closed-interval boundary). b3 is disjoint.
    val a = Seq((1L, ts(0), ts(300))).toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, ts(60), ts(290)), (11L, ts(300), ts(400)), (12L, ts(301), ts(400))
    ).toDF("b_id", "b_start", "b_end")
    val out = Joins.intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 10L), (1L, 11L)),
      s"multi-bucket pair once, touch kept, disjoint dropped: $out")
  }
}
