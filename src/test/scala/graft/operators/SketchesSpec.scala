package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries heavy hitters: the sketch PROPOSES under real counter
  * pressure (distinct keys ≫ capacity), the exact pass DISPOSES, and the
  * certification bound separates provably-exact from refuse-to-answer. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("heavyHitters: exact top-N under counter pressure, any partitioning") {
    // 2 heavy keys + 600 singleton tail keys; capacity 16 ≪ 602 distinct
    val rows = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++
      (1 to 600).map(i => s"t$i")
    val df = rows.toDF("k")
    for (parts <- Seq(1, 7)) {
      val r = Sketches.heavyHitters(df.repartition(parts), $"k",
          topN = 2, capacity = 16)
        .as[(String, Long)].collect().toSeq
      assert(r === Seq(("h1", 500L), ("h2", 300L)),
        s"exact counts at $parts partitions: $r")
    }
  }

  test("heavyHitters: matches a full groupBy count when certifiable") {
    val rows = (1 to 2000).map(i => s"k${i % 37}") // zipf-free but skewed mod
    val df = rows.toDF("k")
    val expect = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("k")).limit(10)
      .as[(String, Long)].collect().toSeq
    val got = Sketches.heavyHitters(df, $"k", topN = 10, capacity = 64)
      .as[(String, Long)].collect().toSeq
    assert(got === expect)
  }

  test("heavyHitters: refuses to answer when the bound cannot certify") {
    // near-uniform: 400 keys × 5 occurrences; capacity 8 → floor = 250,
    // no count reaches it — approximate ranks must not be returned
    val df = (1 to 2000).map(i => s"u${i % 400}").toDF("k")
    val e = intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, $"k", topN = 3, capacity = 8)
    }
    assert(e.getMessage.contains("cannot certify"))
  }

  test("heavyHitters: candidate set smaller than topN is exact by construction") {
    val df = Seq("a", "a", "b").toDF("k")
    val r = Sketches.heavyHitters(df, $"k", topN = 10, capacity = 16)
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("a", 2L), ("b", 1L)))
  }

  test("heavyHitters: mutual eviction cannot fake an exact short answer") {
    // 'a b c d' repeated: with capacity 3 every arrival of d wipes
    // {a,b,c} — the sketch ends (nearly) empty even though a,b,c,d each
    // occur 100 times. The unsound shortcut would return the short
    // candidate list as a certified exact top-2; the eviction flag must
    // force a refusal instead.
    val df = Seq.fill(100)(Seq("a", "b", "c", "d")).flatten.toDF("k")
      .coalesce(1)
    val e = intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, $"k", topN = 2, capacity = 3)
    }
    assert(e.getMessage.contains("cannot certify"))
  }

  test("heavyHitters: a null key is a real heavy hitter, not dropped in pass 2") {
    val df = (Seq.fill(50)(Option.empty[String]) ++
      Seq.fill(10)(Option("x")) ++ Seq.fill(3)(Option("y")))
      .toDF("k")
    val r = Sketches.heavyHitters(df, $"k", topN = 2, capacity = 16)
      .as[(Option[String], Long)].collect().toSeq
    assert(r === Seq((None, 50L), (Some("x"), 10L)),
      s"null must survive the candidate equi-join: $r")
  }

  test("kmvDistinct: exact below k, estimate within the KMV error bound above k") {
    // below k: the sketch IS the set — estimate exact, rel_err 0
    val small = (0L until 100L).toDF("v")
    val r1 = Sketches.kmvDistinct(small, $"v", k = 256)
      .select("estimate", "exact", "rel_err")
      .as[(Double, Long, Double)].head()
    assert(r1 === ((100.0, 100L, 0.0)))
    // above k: standard error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4σ
    val big = (0L until 20000L).toDF("v")
    val r2 = Sketches.kmvDistinct(big, $"v", k = 256)
      .select("exact", "rel_err").as[(Long, Double)].head()
    assert(r2._1 === 20000L)
    assert(r2._2 < 0.25, s"rel_err ${r2._2} beyond 4 sigma")
  }

  test("kmvDistinct: duplicates don't move the estimate (cardinality, not frequency)") {
    val base = (0L until 5000L).toDF("v")
    val dup = ((0L until 5000L) ++ (0L until 5000L) ++ Seq.fill(1000)(7L)).toDF("v")
    val a = Sketches.kmvDistinct(base, $"v").select("estimate").as[Double].head()
    val b = Sketches.kmvDistinct(dup, $"v").select("estimate").as[Double].head()
    assert(a === b)
  }

  test("kmvDistinct: partitioning-invariant (mergeable-summary property)") {
    val vals = (0L until 10000L).map(i => i * 37L % 9973L)
    def run(parts: Int) = Sketches.kmvDistinct(
      vals.toDF("v").repartition(parts), $"v")
      .select("estimate").as[Double].head()
    assert(run(1) === run(16))
  }

  test("kmvDistinct: empty input reports 0/0/0, not NaN") {
    val r = Sketches.kmvDistinct(Seq.empty[Long].toDF("v"), $"v")
      .select("estimate", "exact", "rel_err")
      .as[(Double, Long, Double)].head()
    assert(r === ((0.0, 0L, 0.0)))
  }

  test("groupKmv: exact below k per group, frequency-blind, partitioning-invariant") {
    // group a: 50 distinct values, each repeated 1..40× (frequency noise);
    // group b: 3000 distinct (over k) — estimator path
    val rows = (1 to 50).flatMap(i => Seq.fill(1 + i % 40)(("a", i.toLong))) ++
      (1 to 3000).map(i => ("b", i.toLong))
    for (parts <- Seq(1, 13)) {
      val r = Sketches.groupKmv(rows.toDF("g", "v").repartition(parts),
          $"g", $"v", k = 256)
        .orderBy("grp")
        .as[(String, Int, Long, Double, Long, Double)].collect().toSeq
      val a = r.head; val b = r(1)
      assert(a._1 === "a" && a._3 === 50L && a._4 === 50.0 && a._5 === 50L
        && a._6 === 0.0, s"below-k group must be exact: $a")
      assert(b._1 === "b" && b._3 === 256L && b._5 === 3000L)
      assert(b._6 < 0.2, s"KMV error bound blown at parts=$parts: $b")
    }
  }

  test("groupKmv single group agrees with the whole-relation kmvDistinct") {
    val vals = (1L to 2000L)
    val grouped = Sketches.groupKmv(
        vals.map(v => ("only", v)).toDF("g", "v"), $"g", $"v", k = 128)
      .select("estimate").as[Double].head()
    val whole = Sketches.kmvDistinct(vals.toDF("v"), $"v", k = 128)
      .select("estimate").as[Double].head()
    assert(grouped === whole,
      "same hash, same k, same set → the two spellings are one estimator")
  }

  test("kmvOverlap: identical, disjoint, and below-k sets grade themselves exactly") {
    val a = (1L to 150L).toDF("v")
    // identical sets, below k → everything exact: J=1, intersection=150
    val same = Sketches.kmvOverlap(a, $"v", a, $"v", k = 256)
      .select("jaccard_est", "jaccard_exact", "inter_est", "rel_err")
      .as[(Double, Double, Double, Double)].head()
    assert(same === ((1.0, 1.0, 150.0, 0.0)))
    // disjoint sets → c = 0 → both jaccards and the intersection are 0
    val b = (1000L to 1149L).toDF("v")
    val disj = Sketches.kmvOverlap(a, $"v", b, $"v", k = 256)
      .select("c", "jaccard_est", "jaccard_exact", "inter_est")
      .as[(Long, Double, Double, Double)].head()
    assert(disj === ((0L, 0.0, 0.0, 0.0)))
  }

  test("kmvOverlap: estimator lands near truth above k, duplicate-blind") {
    // |A|=4000, |B|=3000, |A∩B|=1000 (J = 1/6); duplicates added to A
    val a = ((1L to 4000L) ++ (1L to 500L)).toDF("v") // dups must not matter
    val b = (3001L to 6000L).toDF("v")
    val r = Sketches.kmvOverlap(a, $"v", b, $"v", k = 512)
      .select("inter_exact", "rel_err").as[(Long, Double)].head()
    assert(r._1 === 1000L)
    assert(r._2 < 0.35, s"k=512 overlap estimate should land near truth: $r")
  }

  test("quantileSketch: sample = column below k, so estimate ≡ exact") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val r = Sketches.quantileSketch(df, $"id", $"v",
        probs = Seq(0.25, 0.5, 0.75), k = 512)
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(r.map(_._1) === Seq(0.25, 0.5, 0.75))
    r.foreach { case (q, est, exact, err) =>
      assert(est === exact, s"below k the sample IS the column (q=$q)")
      assert(err === 0.0)
    }
  }

  test("quantileSketch: O(1/sqrt(k)) sample error on a skewed column") {
    // lognormal-ish skew via i^2 — the shape where a biased sampler shows
    val df = (1 to 20000).map(i => (i.toLong, (i.toDouble / 100) * (i / 100)))
      .toDF("id", "v")
    val r = Sketches.quantileSketch(df, $"id", $"v",
        probs = Seq(0.5), k = 512)
      .as[(Double, Double, Double, Double)].head()
    // p50 sample std err ≈ 0.5/sqrt(512) ≈ 2.2% in rank terms; 25% in
    // VALUE terms is a very loose ceiling even through the x² warp
    assert(r._4 < 0.25, s"median rel_err ${r._4} way outside sampling error")
  }

  test("quantileSketch: partitioning-invariant (bottom-k sample is mergeable)") {
    val rows = (1 to 5000).map(i => (i.toLong, (i % 997).toDouble))
    def run(parts: Int) = Sketches.quantileSketch(
        rows.toDF("id", "v").repartition(parts), $"id", $"v",
        probs = Seq(0.25, 0.5, 0.75, 0.9), k = 128)
      .select("estimate").as[Double].collect().toSeq
    assert(run(1) === run(16))
  }

  test("groupQuantile: below-k groups are exact, estimates bounded, partitioning-invariant") {
    // two groups: 'small' (10 rows < k=16 ⇒ sample is the whole group,
    // estimate ≡ exact) and 'big' (2000 rows ⇒ genuine 16-row sample)
    val rows = (1 to 10).map(i => (i.toLong, "small", i.toDouble)) ++
      (100 to 2099).map(i => (i.toLong, "big", (i % 500).toDouble))
    val df = rows.toDF("id", "g", "v")
    val r = Sketches.groupQuantile(df, $"g", $"id", $"v",
        probs = Seq(0.25, 0.5, 0.75), k = 16)
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(r.length === 6)
    val small = r.filter(_._1 == "small")
    small.foreach { case (_, q, est, exact, err) =>
      assert(est === exact, s"below-k group must be exact (q=$q)")
      assert(err === 0.0)
    }
    // a 16-row sample of a 0..499-uniform column: loose but real bound
    r.filter(_._1 == "big").foreach { case (_, q, est, exact, err) =>
      assert(err < 0.8, s"big-group q=$q rel_err $err not sampling-plausible")
    }
    val again = Sketches.groupQuantile(df.repartition(13), $"g", $"id", $"v",
        probs = Seq(0.25, 0.5, 0.75), k = 16)
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(again.sortBy(x => (x._1, x._2)) === r.sortBy(x => (x._1, x._2)))
  }

  test("quantileSketch: null identity or value rows are outside the population") {
    val df = Seq((Some(1L), Some(10.0)), (None, Some(99999.0)),
      (Some(2L), None), (Some(3L), Some(20.0)), (Some(4L), Some(30.0)))
      .toDF("id", "v")
    val r = Sketches.quantileSketch(df, $"id", $"v", probs = Seq(0.5), k = 8)
      .as[(Double, Double, Double, Double)].head()
    assert(r._2 === 20.0 && r._3 === 20.0,
      "null-key and null-value rows must not reach sample OR exact leg")
  }

  test("exactQuantilesByRank: bit-identical to percentile on skewed duplicated data") {
    // the rank-arithmetic exact leg (r21) must reproduce Spark's own
    // object-hash `percentile` EXACTLY — duplicates, ties at the cut,
    // probs that land on and between ranks, and a prob at each endpoint
    val rng = new scala.util.Random(42)
    val vals = (0 until 997).map { _ =>
      val v = rng.nextInt(50) // heavy duplication
      if (rng.nextBoolean()) v.toDouble else v + rng.nextDouble()
    }
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val df = vals.toDF("__v")
    val viaRank = Sketches.exactQuantilesByRank(df, probs)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2).toSeq
    val ps = probs.mkString("array(", ", ", ")")
    val viaPercentile = df
      .agg(org.apache.spark.sql.functions.expr(s"percentile(__v, $ps)").as("q"))
      .as[Seq[Double]].head()
    assert(viaRank === viaPercentile) // bit-for-bit, not approximately
  }

  test("exactQuantilesByRank: single row and empty input") {
    val one = Seq(7.5).toDF("__v")
    val r1 = Sketches.exactQuantilesByRank(one, Seq(0.25, 0.5))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2).toSeq
    assert(r1 === Seq(7.5, 7.5))
    val empty = Seq.empty[Double].toDF("__v")
    assert(Sketches.exactQuantilesByRank(empty, Seq(0.5)).count() === 0L,
      "empty population yields no exact rows (percentile's null shape)")
  }
}
