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

  test("chunkOn properties: exact coverage, window bound, lineage — generated docs × configs") {
    // generated corpus: doc lengths 1..120 across several (window, stride)
    // configs; for each, every chunk must respect the window bound, carry
    // contiguous tokens, and the union of chunk spans must cover the doc
    // exactly (no token lost, no position invented)
    val rng = new scala.util.Random(7)
    val docs = (1L to 60L).map { i =>
      val n = 1 + rng.nextInt(120)
      (i, (1 to n).map(j => s"t$j").mkString(" "))
    }.toDF("id", "text")
    for ((w, st) <- Seq((16, 12), (8, 8), (5, 3), (64, 48))) {
      val r = TextAnalysis.chunkOn(docs, $"id", $"text", w, st)
        .select($"doc_id", $"chunk_id", $"n_doc_tokens", $"n_chunk_tokens",
          $"chunk_text")
        .as[(Long, Long, Long, Long, String)].collect()
      r.groupBy(_._1).foreach { case (doc, chunks) =>
        val n = chunks.head._3
        assert(chunks.forall(c => c._4 >= 1 && c._4 <= w),
          s"w=$w st=$st doc=$doc: chunk sizes within (0, window]")
        // chunk i starts at i*stride and is contiguous
        chunks.foreach { case (_, cid, _, len, text) =>
          val expect = ((cid * st + 1) to math.min(cid * st + w, n))
            .map(j => s"t$j").mkString(" ")
          assert(text === expect,
            s"w=$w st=$st doc=$doc chunk=$cid: contiguous slice")
          assert(len === math.min(cid * st + w, n) - cid * st)
        }
        // exact coverage: union of spans = [1, n], and the last chunk is
        // the FIRST one reaching the tail (no degenerate extra chunk)
        val last = chunks.map(_._2).max
        assert(last * st + w >= n, s"tail covered")
        assert(last == 0 || (last - 1) * st + w < n,
          s"w=$w st=$st doc=$doc: no redundant tail chunk")
      }
    }
  }

  test("chunkOn: window/stride coverage, short-doc and tail edges") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // n=10 > W=4: tail
      (2L, "a b c"),                                  // n=3 <= W: 1 chunk
      (3L, "")                                        // split("") = [""] — 1 token
    ).toDF("id", "text")
    val r = TextAnalysis.chunkOn(docs, $"id", $"text", window = 4, stride = 3)
      .select($"doc_id", $"chunk_id", $"n_chunk_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(t => (t._1, t._2)).toSeq
    // doc 1: starts 0,3,6 — ceil((10-4)/3)+1 = 3 chunks; last is full [7..10]
    assert(r.filter(_._1 == 1L).map(_._4) === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // consecutive chunks overlap by window - stride = 1 token
    assert(r.filter(_._1 == 2L) === Seq((2L, 0L, 3L, "a b c")))
    assert(r.filter(_._1 == 3L) === Seq((3L, 0L, 1L, "")))
    // every token of doc 1 is covered by some chunk
    val covered = r.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
  }

  test("groupSample: exactly n per big group, whole group when smaller, partitioning-invariant") {
    val rows = Seq((1L, "a"), (2L, "a")) ++ (10L to 109L).map(i => (i, "b"))
    def run(parts: Int) = Etl.groupSample(
        rows.toDF("id", "g").repartition(parts), $"g", $"id", n = 3)
      .as[(String, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val r = run(1)
    assert(r.count(_._1 == "a") === 2, "small group yields its whole membership")
    assert(r.count(_._1 == "b") === 3)
    assert(r.map(_._2).take(2) === Seq(1, 2), "ranks are 1-based and contiguous")
    assert(run(11) === r, "mergeable buffer ⇒ partitioning-invariant sample")
    // agrees with the window reference spelling
    val u = graft.functions.HashFunctions.md5UniformOpen($"id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"__u", $"id")
    val ref = rows.toDF("id", "g").withColumn("__u", u)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"g", $"rn", $"id")
      .as[(String, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(r === ref)
  }

  test("weightedGroupSample: weight ∝ selection odds, zero-weight excluded, deterministic") {
    // 200 groups, each: one heavy row (w=50) + 9 light rows (w=1). P(heavy
    // sampled at n=1) = 50/59 ≈ 0.85 — across 200 independent groups the
    // heavy-row hit count concentrates hard around 170.
    val rows = (0L until 200L).flatMap { g =>
      (0L until 10L).map { i =>
        val id = g * 100 + i
        (id, s"g$g", if (i == 0) 50.0 else 1.0)
      }
    }
    val df = rows.toDF("id", "g", "w")
    val picked = Etl.weightedGroupSample(df, $"g", $"id", $"w", n = 1)
      .as[(String, Int, Long)].collect().toSeq
    assert(picked.size === 200)
    val heavyHits = picked.count(_._3 % 100 == 0)
    assert(heavyHits > 140 && heavyHits <= 200,
      s"heavy rows should dominate ~85% of picks, got $heavyHits/200")
    // deterministic + partitioning-invariant
    val again = Etl.weightedGroupSample(df.repartition(17), $"g", $"id", $"w", n = 1)
      .as[(String, Int, Long)].collect().toSeq
    assert(again.sortBy(_._1) === picked.sortBy(_._1))
    // zero/negative weights never sampled
    val withZero = df.withColumn("w", when($"id" % 100 === 0L, lit(0.0)).otherwise($"w"))
    val noHeavy = Etl.weightedGroupSample(withZero, $"g", $"id", $"w", n = 1)
      .as[(String, Int, Long)].collect().toSeq
    assert(noHeavy.forall(_._3 % 100 != 0), "zero-weight rows must be unsampleable")
  }
}
