package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the corpus kNN graph — the iterative
  * propagation and structure primitives large-corpus curation leans on
  * once a neighbor graph exists ([[Search.knnGraph]] / the NN-Descent
  * refined edge set):
  *
  *   - '''PageRank''' (Brin & Page 1998, + weighted and personalized
  *     forms): stationary-mass centrality. On a document/domain graph
  *     this is the classic crawl-quality signal (CommonCrawl publishes
  *     harmonic/PageRank centrality per host and web-corpus curation
  *     filters on it); on a kNN graph it scores how "central" a
  *     document is to the corpus distribution — a density proxy that
  *     needs no labels.
  *   - '''Label propagation''' (Zhu & Ghahramani 2002, the hard-label
  *     variant, + the cosine-weighted form): spread sparse trusted
  *     labels over the similarity graph by iterated neighbor majority
  *     vote with clamped seeds — the cheap semi-supervised labeler a
  *     training-data pipeline uses when only a sliver of the corpus is
  *     human-rated. UNCLAMPED from identity labels it becomes
  *     community detection ([[communityLabelProp]], Raghavan 2007),
  *     graded by exact-rational modularity ([[modularityOf]]).
  *   - '''Structure''': [[connectedComponents]] (can signals reach —
  *     reusing [[Dedup.dupClusters]]' hardened min-label loop),
  *     [[kcorePeel]] (the mutually-embedded core vs thin periphery),
  *     [[harmonic3]] (bounded-hop harmonic centrality) and
  *     [[harmonicSketch]] (its HyperBall-style KMV-register form — the
  *     flat-state 100 TB path), [[assortativityOf]] (degree mixing),
  *     [[clusteringOf]] (triangle census), and the takedown faces
  *     ([[componentsDelQ]] splits, [[communitiesDelQ]] re-coarsens,
  *     [[kcoreDelQ]]/[[harmonicDelQ]] stop counting recalled support,
  *     [[blastRadiusQ]] scopes the re-check set).
  *   - '''At-rest refresh + serving''': every propagation variant
  *     (plain/personalized/weighted PageRank, label-prop, communities,
  *     components, kcore, harmonic) has an arm over the STORED graph
  *     layout — ids (+ the stored cos weight) only, never vectors —
  *     and the derived per-doc signals serve as partition-pruned point
  *     lookups through [[Retrieval.run]]'s `centrality` mode.
  *
  * Reference anchor: the reference's retrieval pipeline stops at
  * neighbor lists (`search_similar_images.py:52-95` — per-query kNN);
  * these operators are the corpus-level extension of that same
  * similarity structure (SURVEY §2.7/§2.9 beyond-reference mandate).
  *
  * Scale/determinism contract shared by both:
  *   - Iterative dataflow, NOT driver iteration over rows: each round
  *     is joins + aggregations keyed by node id, so every stage
  *     shuffles by id and is bounded by |E| = N·k rows of (id, id,
  *     double) — vectors never enter the loop.
  *   - Fixed iteration count (the caller picks it), deterministic
  *     tie-breaks everywhere → the whole computation replays as an
  *     unrolled-CTE DuckDB oracle, the same discipline as the BPE
  *     trainer and NN-Descent rounds.
  *   - Float sums are ORDERED two-level folds ([[orderedSumByKey]] /
  *     [[orderedSumByKeySized]]): bit-stable across partitionings AND
  *     engines (Spark `aggregate` over a sorted collect ≡ DuckDB
  *     `list_reduce(list(… ORDER BY …))` — the established maxSim/BM25
  *     oracle idiom). The bucket count is SIZED FROM THE DATA
  *     ([[subBucketsFor]]: b = max(floor, ceil(sqrt(N))) as an in-plan
  *     broadcast scalar), so both fold levels hold ≤ ~sqrt(N) rows per
  *     task — a mega-hub dst (or a mostly-dangling graph) cannot
  *     concentrate O(N/16) structs in one collect_list, at ANY corpus
  *     size and with no knob to mis-set.
  *   - Lineage is cut every round (a sized coalesce + lazy
  *     localCheckpoint, the [[Search.nnDescend]] / pointer-jumping
  *     discipline) so deep iteration counts do not stack a mile-high
  *     plan.
  */
object GraphAnalytics {

  /** Deterministic two-level ordered float sum per key: level 1 folds
    * each (key, ord % b) slice in `ord` order, level 2 folds the slice
    * sums in bucket order. The result is NOT the single flat-ordered
    * fold — it is its own PUBLISHED order (slice-major), chosen because
    * it bounds per-task collect state; the DuckDB oracle replays the
    * same two-level shape, so both engines agree bit-for-bit. `df` must
    * carry `key`/`ord`/`value` columns (ord: long, distinct within key;
    * value: double). Output: (key, sum).
    *
    * This overload takes a LITERAL bucket count — the generic utility.
    * Scale callers should size b from the data instead:
    * [[orderedSumByKeySized]] with [[subBucketsFor]], which is what the
    * propagation loops here do. */
  def orderedSumByKey(df: DataFrame, key: String, ord: String,
      value: String, subBuckets: Int = 16): DataFrame = {
    require(subBuckets >= 1, s"orderedSumByKey: subBuckets >= 1, got $subBuckets")
    orderedSumByKeySized(df, key, ord, value,
      df.sparkSession.range(1).select(lit(subBuckets.toLong).as("__b")))
  }

  /** [[orderedSumByKey]] with the bucket count read from the one-row
    * relation `bDf (__b: long)` instead of a literal — the b itself
    * stays inside the plan (no driver job, no knob), and the published
    * slice-major order is a pure function of (data, b) that the DuckDB
    * oracles replay with the same in-SQL b derivation. */
  def orderedSumByKeySized(df: DataFrame, key: String, ord: String,
      value: String, bDf: DataFrame): DataFrame =
    df.select(col(key).as("__k"), col(ord).as("__o"),
        col(value).as("__x"))
      .crossJoin(broadcast(bDf))
      .groupBy(col("__k"), pmod(col("__o"), col("__b")).as("__bk"))
      .agg(expr("aggregate(sort_array(collect_list(struct(__o, __x))), " +
        "CAST(0 AS DOUBLE), (acc, e) -> acc + e.__x)").as("__s1"))
      .groupBy("__k")
      .agg(expr("aggregate(sort_array(collect_list(struct(__bk, __s1))), " +
        "CAST(0 AS DOUBLE), (acc, e) -> acc + e.__s1)").as("__sum"))
      .select(col("__k").as(key), col("__sum").as("sum"))

  /** One-row `(__b: long)` fold-sizing relation: b = max(floor,
    * ceil(sqrt(count(of)))). Any per-node fold over a graph of N nodes
    * has fan-in ≤ N, so with b ≈ sqrt(N) BOTH fold levels hold ≤
    * ~sqrt(N) rows per task — the hub-degree worst case included.
    * Derived IN-PLAN (a broadcast one-row agg), so plan construction
    * runs no Spark job and there is no constant to outgrow; the oracles
    * replay the identical greatest/ceil/sqrt integer derivation
    * (IEEE-754 sqrt is correctly rounded, so both engines agree on b
    * exactly). */
  def subBucketsFor(of: DataFrame, floor: Int = 16): DataFrame = {
    require(floor >= 1, s"subBucketsFor: floor >= 1, got $floor")
    of.agg(greatest(lit(floor.toLong),
      ceil(sqrt(count(lit(1)).cast("double")))).as("__b"))
  }

  /** The shared power-iteration loop over a teleport vector `tvec` =
    * (id, __t) with Σ __t = 1:
    *
    *   pr'(v) = (1-d)·t(v) + d · (dm·t(v) + Σ_{u→v} pr(u)/outdeg(u)),
    *   dm = Σ_dangling pr(u),  pr₀ = t
    *
    * Uniform t = 1/N is classic PageRank; t concentrated on a seed set
    * is personalized PageRank. Dangling mass re-enters THROUGH the
    * teleport vector (the standard formulation), so mass is conserved
    * every round in both variants — for ANY edge input, since dst-
    * outside edges are semi-joined away (see below). All float sums are
    * ordered folds (see the object doc) with the node-count-derived
    * bucket sizing of [[subBucketsFor]], so even a corpus that is
    * MOSTLY dangling (a heavily-tombstoned graph) or a mega-hub dst
    * never folds more than ~sqrt(N) values in one task.
    *
    * `orderedFolds = false` is the PRODUCTION FAST PATH: plain
    * partial-aggregated `sum()` everywhere a float fold runs —
    * map-side combine, no collect_list, no published order. The values
    * differ from the ordered spelling only by float association
    * (GraphAnalyticsSpec pins ≤ 1e-12 relative on the corpus graph),
    * but they are NOT bit-stable across partitionings, so every
    * oracle-checked named query keeps the ordered default; the flag
    * exists for throughput-critical refreshes that tolerate float
    * noise. The ScaleBench A/B row (`graph_pagerank_fast_scaled` vs
    * `graph_pagerank_scaled`) measured what it buys: 9.97 → 8.80 s at
    * the 10× arm (~1.13×) — the edge build dominates the loop, so the
    * ordered-fold determinism tax is ~12% of the row and below the
    * 1.3× bar for rewiring any named query.
    *
    * `edges` and `tvec` are referenced by EVERY round, so Catalyst
    * re-derives their upstream plan per reference. For cheap sources
    * (a parquet edge table, a projection) that is free and beats
    * caching — a measured same-day A/B at sf0.1 read the pin-everything
    * spelling 1.5× SLOWER (InMemoryRelation loses source stats, so the
    * per-round joins fall off broadcast onto sort-merge). For EXPENSIVE
    * derivations, materialize first: that is what the at-rest graph
    * index is for (`graph_pagerank_refined` reads stored edge ids and
    * measured 1.8× faster than the in-plan blocked build), and
    * localCheckpoint is the in-JVM equivalent. */
  /** Data-proportional partition count for a loop-cut frame (r21, guide
    * §2 "make partitioning scale-adaptive"): ceil(estimated plan bytes /
    * the AQE advisory partition size), ≥ 1. The r20 per-round lazy
    * checkpoints materialized every round at
    * spark.sql.shuffle.partitions (= the core count in the bench)
    * regardless of data size, and an RDD scan's partitioning is frozen
    * against AQE coalescing — so at sf0.1 the ppr/pagerank family ran
    * ~3× FASTER at 8 cores than at 32 (PERF_r20 scaling ratios 0.29-0.35)
    * and graph_ppr/_refined regressed 25-30% vs the uncut r19 spelling.
    * A `coalesce()` to this count collapses the tiny-data case (one
    * near-empty partition per core per round → 1) and is a NO-OP at
    * scale (coalesce never raises a partition count, and any estimate ≥
    * advisory yields ≥ the natural count), so the cut partitioning stays
    * ∝ data instead of ∝ the local core count. Driver-side only:
    * reading optimizedPlan.stats runs no Spark job, and the loops call
    * it on per-round plans that are one cut deep (cheap to optimize).
    * Unknown stats (defaultSizeInBytes = Long.Max) degrade to the
    * current behavior, never below it. */
  private def cutParts(df: DataFrame): Int = {
    val advisory = BigInt(df.sparkSession.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((bytes + advisory - 1) / advisory)
      .max(BigInt(1)).min(BigInt(1 << 22)).toInt
  }

  /** The standard loop cut: [[cutParts]]-sized coalesce + lazy
    * localCheckpoint. Values are unchanged — every fold that crosses one
    * of these cuts is partitioning-independent by design (ordered folds,
    * integer argmax, set distinct). */
  private def sizedCut(df: DataFrame, parts: Int): DataFrame =
    df.coalesce(parts).localCheckpoint(eager = false)

  private def prIterate(tvec: DataFrame, edges: DataFrame, iters: Int,
      damping: Double, subBuckets: Int,
      weighted: Boolean = false,
      orderedFolds: Boolean = true): DataFrame = {
    require(iters >= 1, s"pageRank: iters >= 1, got $iters")
    // Loop-lineage discipline (r20 — the kcorePeel note applied here):
    // tvec and the semi-joined edge set are referenced by EVERY round
    // (~2·iters times each), and the loop-carried pr is referenced
    // TWICE per round (the dangling-mass fold and the contribution
    // join), so an uncut chain DOUBLES per round — graph_ppr_del's
    // pre-r20 3-round plan held 1126 Exchange nodes and 586 parquet
    // scans of the same inputs. tvec, e, od and dangling (all
    // loop-invariant) plus each round's pr are therefore cut with LAZY
    // localCheckpoints (`eager = false`: plan construction runs no job —
    // the deferred-view contract; the first action materializes each
    // cut once and every reference reuses its blocks). Values are
    // unchanged: the ordered folds are partitioning-independent by
    // design and a checkpoint stores the same deterministic rows.
    // (The old `checkpointEvery` knob was subsumed by the every-round
    // cut and removed in r21 — a silently-ignored parameter misleads.)
    // Every cut is coalesced to a
    // data-proportional partition count first (see [[cutParts]] — the
    // r21 fix for the r20 32-partition-per-round materialization tax);
    // nV sizes the node-cardinality frames (tv, od, dangling, each
    // round's pr — all ≤ one row per node), nE the semi-joined edges.
    val nV = cutParts(tvec)
    val nE = cutParts(edges)
    val tv = sizedCut(tvec, nV)
    // Conservation contract for ANY input: an edge whose dst falls
    // outside the node set would count in its src's out-degree yet
    // deliver its mass nowhere (sum(pr) silently < 1, no error) — the
    // dst semi-join removes it up front, turning a node whose whole
    // out-list pointed outside into an honest dangling node. Edges with
    // an outside SRC carry no mass to lose (they drop at the pr join).
    val cols = Seq(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")) ++
      (if (weighted) Seq(col("w").cast("double").as("w")) else Nil)
    val e = sizedCut(edges.select(cols: _*)
      .join(tv.select(col("id").as("dst")), Seq("dst"), "left_semi"), nE)
    // Hub-safe fold sizing, shared by the dangling fold (fan-in ≤ N),
    // the per-dst contribution fold (fan-in = in-degree ≤ N) and the
    // weighted out-mass fold (fan-in = out-degree ≤ N):
    // b = max(subBuckets, ceil(sqrt(N))) as an in-plan broadcast scalar
    // — loop-invariant, no driver job, bounds every collect_list task
    // at ~sqrt(N) structs. `subBuckets` is now the FLOOR of that
    // derivation, not the fixed count.
    val bDf = subBucketsFor(tv, subBuckets)
    // out-mass normalizer, loop-invariant: edge COUNT unweighted (the
    // double cast is bit-neutral — Spark's divide casts the long
    // operand anyway), ordered per-src weight fold when weighted.
    val od = sizedCut(
      if (weighted && orderedFolds)
        orderedSumByKeySized(e, "src", "dst", "w", bDf)
          .select(col("src"), col("sum").as("__od"))
      else if (weighted)
        e.groupBy("src").agg(sum(col("w")).as("__od"))
      else e.groupBy("src").agg(count(lit(1)).cast("double").as("__od")),
      nV)
    val dangling = sizedCut(tv.select("id")
      .join(od.select(col("src").as("id")), Seq("id"), "left_anti"), nV)
    var pr = tv.select(col("id"), col("__t").as("pr"))
    for (t <- 1 to iters) {
      // Σ pr over dangling nodes → one broadcastable row. groupBy().agg
      // on an EMPTY input still yields one row (global agg), whose
      // collect_list is [] and whose fold is 0.0 — no special case.
      // (Fast path: a plain partial-aggregated sum — coalesce covers
      // the empty case where sum yields null.)
      val dm =
        if (orderedFolds)
          pr.join(dangling, "id")
            .crossJoin(broadcast(bDf))
            .groupBy(pmod(col("id"), col("__b")).as("__bk"))
            .agg(expr("aggregate(sort_array(collect_list(struct(id, pr))), " +
              "CAST(0 AS DOUBLE), (acc, e) -> acc + e.pr)").as("__s1"))
            .agg(expr("aggregate(sort_array(collect_list(struct(__bk, __s1))), " +
              "CAST(0 AS DOUBLE), (acc, e) -> acc + e.__s1)").as("__dm"))
        else
          pr.join(dangling, "id")
            .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dm"))
      val contribs = e.join(od, "src")
        .join(pr.select(col("id").as("src"), col("pr").as("__p")), "src")
        .select(col("dst"), col("src"),
          (if (weighted) col("__p") * col("w") / col("__od")
           else col("__p") / col("__od")).as("__c"))
      val sums =
        if (orderedFolds) orderedSumByKeySized(contribs, "dst", "src", "__c", bDf)
        else contribs.groupBy("dst").agg(sum(col("__c")).as("sum"))
      pr = tv
        .join(sums.select(col("dst").as("id"), col("sum").as("__s")), Seq("id"), "left")
        .crossJoin(broadcast(dm))
        .select(col("id"),
          (lit(1.0 - damping) * col("__t") + lit(damping) *
            (col("__dm") * col("__t") + coalesce(col("__s"), lit(0.0)))).as("pr"))
      if (t < iters) pr = sizedCut(pr, nV)
    }
    pr
  }

  /** PageRank with uniform teleport ([[prIterate]] at t = 1/N).
    * `nodes` = (id) distinct, `edges` = (src, dst) distinct directed
    * pairs over those ids. Mass is conserved every round (Σ pr = 1 up
    * to float error), so ranks are comparable across corpora of equal
    * N. Fully lazy: 1/N is an in-plan broadcast scalar (bit-identical
    * to the driver-side division it replaced), so constructing the plan
    * — e.g. at view registration — runs NO Spark job. An empty node set
    * yields an empty result (nothing to rank), not an error. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85, subBuckets: Int = 16,
      orderedFolds: Boolean = true): DataFrame = {
    val ids = nodes.select(col("id").cast("long").as("id"))
    val inv = broadcast(ids.agg((lit(1.0) / count(lit(1))).as("__t")))
    prIterate(ids.crossJoin(inv), edges, iters, damping, subBuckets,
      orderedFolds = orderedFolds)
  }

  /** [[pageRank]] with out-mass split ∝ EDGE WEIGHT instead of
    * uniformly across out-edges — pr'(v) gains Σ_{u→v} pr(u)·w(u,v)/W(u)
    * with W(u) = Σ_out w, so mass flows preferentially along TRUSTED
    * edges (the [[weightedLabelPropagation]] relationship, for
    * centrality). W folds through the same hub-safe slice-major order
    * as every float sum here; `edges` = (src, dst, w) with w > 0 the
    * caller's contract (an all-zero out-weight divides to NaN —
    * calibrate first, e.g. (cos+1)/2). With equal weights this is
    * BIT-IDENTICAL to [[pageRank]] (the spec pins it). */
  def weightedPageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85, subBuckets: Int = 16): DataFrame = {
    val ids = nodes.select(col("id").cast("long").as("id"))
    val inv = broadcast(ids.agg((lit(1.0) / count(lit(1))).as("__t")))
    prIterate(ids.crossJoin(inv), edges, iters, damping, subBuckets,
      weighted = true)
  }

  /** Personalized PageRank ([[prIterate]] with teleport mass uniform
    * over the seed rows of `nodes` = (id, seed: boolean)): graph
    * proximity to a trusted seed set — the seed-expansion selection
    * signal (rank the corpus by similarity-graph closeness to a
    * curated sample, keep the top slice). Dangling mass teleports BACK
    * to the seeds, so scores still sum to 1 and rankings stay
    * comparable across seed sets. Lazy like [[pageRank]]: 1/|seeds| is
    * an in-plan broadcast scalar; an empty seed set yields all-zero
    * mass (there is nowhere for the teleport to land), not an error. */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85, subBuckets: Int = 16): DataFrame = {
    val base = nodes.select(col("id").cast("long").as("id"), col("seed"))
    // LOUD guard on the teleport normalizer (the kcoreConverged /
    // modularity-bound assert discipline): with zero live seeds —
    // every seed doc tombstoned by a takedown, or a wrong seed
    // predicate — 1.0/sum(seed) is silently Infinity and every rank
    // propagates NaN/Inf. The assert rides the same 1-row broadcast
    // agg, so it costs nothing and fires exactly where the normalizer
    // is derived; values are unchanged whenever any seed is live.
    val inv = broadcast(base.agg(
        sum(when(col("seed"), 1L).otherwise(0L)).as("__ns"))
      .filter(assert_true(col("__ns") > 0,
        lit("personalizedPageRank: zero live seed nodes (every seed " +
          "is absent or tombstoned) — the teleport normalizer " +
          "1/sum(seed) would serve Inf/NaN ranks; fix the seed " +
          "predicate or the takedown list")).isNull)
      .select((lit(1.0) / col("__ns")).as("__is")))
    prIterate(
      base.crossJoin(inv).select(col("id"),
        when(col("seed"), col("__is")).otherwise(lit(0.0)).as("__t")),
      edges, iters, damping, subBuckets)
  }

  /** Hard label propagation with clamped seeds, `iters` fixed rounds:
    * each round every node adopts the majority label among its labeled
    * in-neighbors (count desc, label asc tie-break — pure INTEGER
    * arithmetic, so the replay is exact with no float discipline
    * needed); nodes with no labeled neighbor keep their current label;
    * seed nodes never change. Pass the undirected closure of a kNN
    * edge list for the usual symmetric variant.
    *
    * `nodes` = (id, seed) with seed null for unlabeled; `edges` =
    * (src, dst): src votes on dst. Per round: one join by src (label
    * lookup), one (dst, label) count, one per-dst argmax window — every
    * stage keyed and bounded by |E|. Output: (id, label) with label
    * null only where no label ever reached the node. */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"labelPropagation: iters >= 1, got $iters")
    // Loop-lineage discipline (r20): base and e are referenced every
    // round and lbl TWICE per round (vote lookup + prev-label join), so
    // the uncut chain doubles per round — see the prIterate note. Lazy
    // cuts, values unchanged (integer argmax, deterministic
    // tie-breaks). Cuts coalesced to data-proportional counts (r21,
    // see [[cutParts]]).
    val nV = cutParts(nodes)
    val nE = cutParts(edges)
    val base = sizedCut(
      nodes.select(col("id").cast("long").as("id"), col("seed")), nV)
    val e = sizedCut(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")), nE)
    var lbl = base.select(col("id"), col("seed").as("lbl"))
    val w = Window.partitionBy("dst").orderBy(desc("__c"), asc("__vl"))
    for (t <- 1 to iters) {
      val cand = e
        .join(lbl.select(col("id").as("src"), col("lbl").as("__vl")), "src")
        .filter(col("__vl").isNotNull)
        .groupBy("dst", "__vl").agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("dst").as("id"), col("__vl").as("__cand"))
      lbl = base
        .join(lbl.select(col("id"), col("lbl").as("__prev")), Seq("id"), "left")
        .join(cand, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("seed"), col("__cand"), col("__prev")).as("lbl"))
      if (t < iters) lbl = sizedCut(lbl, nV)
    }
    lbl
  }

  /** [[labelPropagation]] with EDGE-WEIGHTED votes (Zhu & Ghahramani's
    * weighted form): each labeled in-neighbor contributes its edge
    * weight instead of 1, per-(node, label) totals fold through
    * [[orderedSumByKey]]'s slice-major order (bit-stable, hub-safe),
    * argmax by (weight sum desc, label asc). A near-duplicate neighbor
    * at cos 0.99 outvotes three marginal cos-0.3 ones — the right call
    * when edge weight measures trust. `edges` = (src, dst, w). */
  def weightedLabelPropagation(nodes: DataFrame, edges: DataFrame,
      iters: Int, subBuckets: Int = 16): DataFrame = {
    require(iters >= 1, s"weightedLabelPropagation: iters >= 1, got $iters")
    // Loop-lineage discipline (r20) — the labelPropagation note applies
    // verbatim; the slice-major fold keeps its published order (it is
    // partitioning-independent by design), so values are unchanged.
    // Cuts coalesced to data-proportional counts (r21, [[cutParts]]).
    val nV = cutParts(nodes)
    val nE = cutParts(edges)
    val base = sizedCut(
      nodes.select(col("id").cast("long").as("id"), col("seed")), nV)
    val e = sizedCut(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("w").cast("double").as("w")), nE)
    // per-(dst, label) fan-in ≤ in-degree ≤ N ⇒ the node-count sizing
    // bounds both fold levels at ~sqrt(N) (see [[subBucketsFor]])
    val bDf = subBucketsFor(base, subBuckets)
    var lbl = base.select(col("id"), col("seed").as("lbl"))
    val rankW = Window.partitionBy("dst").orderBy(desc("__s"), asc("__vl"))
    for (t <- 1 to iters) {
      val votes = e
        .join(lbl.select(col("id").as("src"), col("lbl").as("__vl")), "src")
        .filter(col("__vl").isNotNull)
      // the two-level slice-major fold, keyed by the composite
      // (dst, label) — same published order as [[orderedSumByKeySized]]
      val sums = votes
        .crossJoin(broadcast(bDf))
        .groupBy(col("dst"), col("__vl"),
          pmod(col("src"), col("__b")).as("__bk"))
        .agg(expr("aggregate(sort_array(collect_list(struct(src, w))), " +
          "CAST(0 AS DOUBLE), (acc, e) -> acc + e.w)").as("__s1"))
        .groupBy("dst", "__vl")
        .agg(expr("aggregate(sort_array(collect_list(struct(__bk, __s1))), " +
          "CAST(0 AS DOUBLE), (acc, e) -> acc + e.__s1)").as("__s"))
      val cand = sums
        .withColumn("__rn", row_number().over(rankW)).filter(col("__rn") === 1)
        .select(col("dst").as("id"), col("__vl").as("__cand"))
      lbl = base
        .join(lbl.select(col("id"), col("lbl").as("__prev")), Seq("id"), "left")
        .join(cand, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("seed"), col("__cand"), col("__prev")).as("lbl"))
      if (t < iters) lbl = sizedCut(lbl, nV)
    }
    lbl
  }

  // ---------------------------------------------------------------- //
  // Named queries over the embeddings table's cluster-blocked kNN     //
  // graph (k=3 — the same deterministic edge set `knn_graph` checks). //
  // ---------------------------------------------------------------- //

  private[operators] val Iters = 3
  private val SeedMod = 5 // vec_id % 5 == 0 → seed (20% trusted labels)
  private val PprSeedLabel = 3 // the "curated sample": all label-3 docs

  /** The `knn_graph` edge set as (src, dst, cos) — Spark side, built
    * ONCE per (JVM, sfDir) into scratch parquet
    * ([[graft.plans.Scratch]]). This is the one EXPENSIVE in-plan
    * derivation the whole family shares: kmeans assignment + cluster
    * self-join + rank window. Before r19 every in-plan Q binding
    * re-derived it per REFERENCE — [[prIterate]] reads its `edges` arg
    * from the loop-invariant out-degree fold AND from every round's
    * contribution join, so a 3-round propagation replayed the build
    * ~7×, and the 8 most expensive suite rows were all in-plan
    * propagation arms. r19 memoized it behind a lazy localCheckpoint;
    * r20 moved the memo to scratch parquet because the bench's per-rep
    * RDD unpersist was silently killing the checkpoint blocks (see the
    * Scratch doc — reps 2-3 of every consumer failed and timed the
    * failure). Values are unchanged — the stored rows ARE the same
    * deterministic derivation (all graph oracles re-verified at
    * sf0.01). */
  private[operators] def knnEdgesCos(s: SparkSession, d: String): DataFrame =
    graft.plans.Scratch.frame(s, s"edgescos|$d") {
      Search.knnGraph(Tables.embeddings(s, d), col("vec_id"), col("embedding"),
          Retrieval.labelCentroids(s, d).select(col("label").as("cid"), col("c")),
          k = 3)
        .select(col("__vid").as("src"), col("nbr_id").as("dst"), col("cos"))
    }

  /** The `knn_graph` edge set as (src, dst) — Spark side. */
  private def knnEdges(s: SparkSession, d: String): DataFrame =
    knnEdgesCos(s, d).select("src", "dst")

  /** The PRODUCTION graph's stored edge list (src, dst) — the clean
    * at-rest layout every `_refined` arm reads: no vectors, no
    * kmeans/NN-Descent re-run, just the (src, dst[, cos]) rows
    * [[Search.writeGraphIndex]] persisted. */
  private def storedEdges(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
      .select(col("__vid").as("src"), col("nbr_id").as("dst"))

  /** PageRank over the directed kNN graph: corpus-centrality per
    * document, the label-free density/quality signal. 3 iterations,
    * d = 0.85. The pr column is bit-exact vs the oracle (integer-
    * derived doubles through ordered folds); round(9) is cosmetic. */
  def pageRankQ(s: SparkSession, d: String): DataFrame =
    pageRank(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        knnEdges(s, d), iters = Iters)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"))
      .orderBy("vec_id")

  /** Label propagation over the UNDIRECTED closure of the kNN graph
    * from 20% clamped seeds (vec_id % 5 == 0 keeps its true label):
    * the semi-supervised labeler. Output is every node's final label
    * (null = unreachable from any seed) plus its seed flag. */
  def labelPropQ(s: SparkSession, d: String): DataFrame = {
    val e = knnEdges(s, d)
    val und = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      when(col("vec_id") % SeedMod === 0, col("label")).as("seed"))
    labelPropagation(nodes, und, iters = Iters)
      .select(col("id").as("vec_id"), col("lbl").as("label"),
        (col("id") % SeedMod === 0).as("is_seed"))
      .orderBy("vec_id")
  }

  /** Propagation-quality meter — and itself a fully oracle-checked
    * relation (all-integer): how often the propagated label agrees
    * with the held-out truth on non-seed nodes. The blocked kNN graph
    * is label-centroid-clustered, so high agreement is the expected
    * read; the row guards regressions in the propagation semantics. */
  def labelPropAccQ(s: SparkSession, d: String): DataFrame = {
    val truth = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").as("truth"))
    labelPropQ(s, d).join(truth, "vec_id")
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(when(col("is_seed"), 1L).otherwise(0L)).as("n_seed"),
        sum(when(!col("is_seed") && col("label").isNotNull, 1L)
          .otherwise(0L)).as("n_pred"),
        sum(when(!col("is_seed") && col("label") === col("truth"), 1L)
          .otherwise(0L)).as("n_correct"))
      .select(col("n_nodes"), col("n_seed"), col("n_pred"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_pred"), 6).as("acc"))
  }

  /** PPR ranks from the label-[[PprSeedLabel]] trusted set, joined
    * back to the seed flag — shared by [[pprQ]] / [[pprExpandQ]]. */
  private def pprRanks(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      (col("label") === PprSeedLabel).as("seed"))
    personalizedPageRank(nodes, knnEdges(s, d), iters = Iters)
      .join(nodes.select(col("id"), col("seed").as("is_seed")), "id")
  }

  /** Personalized PageRank from a trusted seed set (all label-3 docs):
    * every document's similarity-graph proximity to the seeds — the
    * seed-expansion selection signal, full relation. Bit-exact vs the
    * oracle like [[pageRankQ]]. */
  def pprQ(s: SparkSession, d: String): DataFrame =
    pprRanks(s, d)
      .select(col("id").as("vec_id"), col("is_seed"),
        round(col("pr"), 9).as("ppr"))
      .orderBy("vec_id")

  /** PPR over the PRODUCTION graph — the teleport-variant twin of
    * [[pageRankRefinedQ]]: the NN-Descent refined edge set read from
    * the at-rest layout ([[Retrieval.graphIdxDir]]), seed mass on the
    * label-[[PprSeedLabel]] trusted set. The 100 TB shape for
    * seed-expansion refreshes: a new curated sample re-ranks the corpus
    * against the STORED edge list (ids only, no vectors) — the
    * kmeans/NN-Descent build never re-runs, only the |E|-bounded
    * propagation loop does. Bit-exact vs the oracle's refined-pyramid
    * replay like every ranking here. */
  def pprRefinedQ(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      (col("label") === PprSeedLabel).as("seed"))
    personalizedPageRank(nodes,
        s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst")),
        iters = Iters)
      .join(nodes.select(col("id"), col("seed").as("is_seed")), "id")
      .select(col("id").as("vec_id"), col("is_seed"),
        round(col("pr"), 9).as("ppr"))
      .orderBy("vec_id")
  }

  /** Takedown-aware PPR — [[pprRefinedQ]] over the TOMBSTONED layout:
    * a recalled doc leaves the node set AND the seed set (its teleport
    * mass redistributes over the surviving trusted docs — the
    * normalizer is the LIVE seed count), and neither direction of its
    * edges conducts. A contaminated doc recalled from the curated
    * sample must stop pulling its neighborhood into the training
    * slice — the takedown face of seed expansion. */
  def pprDelQ(s: SparkSession, d: String): DataFrame = {
    val nodes = delLiveEmb(s, d)
      .select(col("id"), (col("label") === PprSeedLabel).as("seed"))
    val edges = delLiveEdgesCos(s, d).select("src", "dst")
    personalizedPageRank(nodes, edges, iters = Iters)
      .join(nodes.select(col("id"), col("seed").as("is_seed")), "id")
      .select(col("id").as("vec_id"), col("is_seed"),
        round(col("pr"), 9).as("ppr"))
      .orderBy("vec_id")
  }

  /** The expansion face: the 20 NON-seed documents closest to the
    * trusted set by PPR mass — "given this curated sample, which docs
    * should join the training slice next". Selection is by raw pr (both
    * sides), but the SERVED row order re-sorts by the rounded column —
    * the oracle's outer ORDER BY key — so two raw-distinct, round-equal
    * ppr values cannot order-diverge under the hash check. */
  def pprExpandQ(s: SparkSession, d: String): DataFrame =
    pprRanks(s, d).filter(!col("is_seed"))
      .orderBy(desc("pr"), asc("id")).limit(20)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("ppr"))
      .orderBy(desc("ppr"), asc("vec_id"))

  /** PageRank over the PRODUCTION graph — the NN-Descent refined edge
    * set read from the at-rest graph index ([[Retrieval.graphIdxDir]]:
    * built once per JVM × sfDir, bit-identical to the in-plan
    * derivation, IvfLayoutSpec pins it). The 100 TB shape: centrality
    * refreshes re-read the stored edge list (ids only, no vectors),
    * never re-run the kmeans/NN-Descent build. Build attribution lives
    * in `knn_graph_refined`; this row measures the propagation loop on
    * the served graph. */
  def pageRankRefinedQ(s: SparkSession, d: String): DataFrame =
    pageRank(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst")),
        iters = Iters)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"))
      .orderBy("vec_id")

  /** kNN-density profile: each vector's degree and mean cosine to its
    * blocked top-3 neighbors — the distribution-outlier signal (a doc
    * whose nearest neighbors are all FAR is junk/noise; one whose
    * neighbors are near-identical is redundancy the dedup family
    * handles). The 3-term mean folds in neighbor order, so the value
    * is bit-exact vs the oracle. Singleton-cluster vectors have no
    * edges and no row — the honest read (density undefined, the
    * codebook, not the data, isolated them). */
  def densityQ(s: SparkSession, d: String): DataFrame =
    densityOf(knnEdgesCos(s, d)).orderBy("vec_id")

  /** [[densityQ]]'s core over any (src, dst, cos) edge list: per-src
    * degree and neighbor-ordered mean cosine. */
  def densityOf(edges: DataFrame): DataFrame =
    edges.groupBy(col("src"))
      .agg(count(lit(1)).as("degree"),
        expr("aggregate(sort_array(collect_list(struct(dst, cos))), " +
          "CAST(0 AS DOUBLE), (acc, e) -> acc + e.cos)").as("__sum"))
      .select(col("src").as("vec_id"), col("degree"),
        round(col("__sum") / col("degree"), 6).as("mean_cos"))

  /** [[densityQ]] over the PRODUCTION graph — the stored cos column's
    * direct payoff: the junk/outlier signal (a doc whose refined
    * nearest neighbors are all FAR) refreshes from (src, dst, cos) rows
    * alone, no vectors and no NN-Descent re-run. */
  def densityRefinedQ(s: SparkSession, d: String): DataFrame =
    densityOf(s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
        .select(col("__vid").as("src"), col("nbr_id").as("dst"), col("cos")))
      .orderBy("vec_id")

  /** [[densityRefinedQ]] with takedowns honored — degree and mean-cos
    * recomputed over the TOMBSTONED layout's surviving weighted edges:
    * a doc whose nearest neighbors were recalled honestly reads a
    * thinner degree (its density evidence shrank), and recalled docs
    * emit no row. Completes density's in-plan/refined/del triple. */
  def densityDelQ(s: SparkSession, d: String): DataFrame =
    densityOf(delLiveEdgesCos(s, d)).orderBy("vec_id")

  /** [[labelPropQ]]'s weighted twin — cosine-weighted votes over the
    * same seeds, graph, and round count, so the two relations diff
    * directly: rows where they disagree are exactly the nodes whose
    * majority and weighted-majority verdicts split. */
  def labelPropWQ(s: SparkSession, d: String): DataFrame = {
    val e = knnEdgesCos(s, d)
    val und = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"), col("cos")))
      .distinct()
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      when(col("vec_id") % SeedMod === 0, col("label")).as("seed"))
    weightedLabelPropagation(nodes,
        und.select(col("src"), col("dst"), col("cos").as("w")),
        iters = Iters)
      .select(col("id").as("vec_id"), col("lbl").as("label"),
        (col("id") % SeedMod === 0).as("is_seed"))
      .orderBy("vec_id")
  }

  /** [[labelPropWQ]] over the PRODUCTION graph — weighted votes
    * through the STORED cos column (the r17 layout schema): the
    * trusted-seed spread refreshes from (src, dst, cos) rows alone, no
    * vector join and no NN-Descent re-run — the weighted half of the
    * at-rest propagation matrix that `graph_pagerank_w_refined`
    * opened. */
  def labelPropWRefinedQ(s: SparkSession, d: String): DataFrame = {
    val e = s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
      .select(col("__vid").as("src"), col("nbr_id").as("dst"), col("cos"))
    val und = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"), col("cos")))
      .distinct()
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      when(col("vec_id") % SeedMod === 0, col("label")).as("seed"))
    weightedLabelPropagation(nodes,
        und.select(col("src"), col("dst"), col("cos").as("w")),
        iters = Iters)
      .select(col("id").as("vec_id"), col("lbl").as("label"),
        (col("id") % SeedMod === 0).as("is_seed"))
      .orderBy("vec_id")
  }

  /** Takedown-aware weighted labeling — [[labelPropWRefinedQ]] with
    * tombstones honored: a recalled seed's weighted votes stop
    * conducting, live nodes only. Closes the label-prop face of the
    * takedown matrix (plain del existed; the weighted arm didn't). */
  def labelPropWDelQ(s: SparkSession, d: String): DataFrame = {
    val e = delLiveEdgesCos(s, d)
    val und = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"), col("cos")))
      .distinct()
    val nodes = delLiveEmb(s, d).select(col("id"),
      when(col("id") % SeedMod === 0, col("label")).as("seed"))
    weightedLabelPropagation(nodes,
        und.select(col("src"), col("dst"), col("cos").as("w")),
        iters = Iters)
      .select(col("id").as("vec_id"), col("lbl").as("label"),
        (col("id") % SeedMod === 0).as("is_seed"))
      .orderBy("vec_id")
  }

  /** Cosine-weighted centrality — [[pageRankQ]]'s weighted twin (the
    * `graph_label_prop` / `graph_label_prop_w` relationship, for
    * PageRank): out-mass splits ∝ the calibrated edge weight
    * (cos+1)/2 ∈ (0, 1], so a near-duplicate neighbor conducts more
    * rank than a marginal one. Same graph, rounds and damping as
    * [[pageRankQ]], so the two relations diff directly. */
  def pageRankWQ(s: SparkSession, d: String): DataFrame =
    weightedPageRank(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        knnEdgesCos(s, d).select(col("src"), col("dst"),
          ((col("cos") + lit(1.0)) / lit(2.0)).as("w")),
        iters = Iters)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"))
      .orderBy("vec_id")

  /** Cosine-weighted centrality over the PRODUCTION graph —
    * [[pageRankWQ]]'s at-rest twin, closing the teleport/weight matrix
    * over the stored layout (plain/ppr/weighted now all have `_refined`
    * arms): the NN-Descent edge WEIGHTS ride the layout (the `cos`
    * column [[Search.writeGraphIndex]] stores when the builder has it),
    * so the refresh reads (src, dst, cos) — still no vectors, no
    * kmeans/NN-Descent re-run — and splits out-mass ∝ the calibrated
    * (cos+1)/2 exactly as the in-plan twin does. */
  def pageRankWRefinedQ(s: SparkSession, d: String): DataFrame =
    weightedPageRank(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst"),
            ((col("cos") + lit(1.0)) / lit(2.0)).as("w")),
        iters = Iters)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"))
      .orderBy("vec_id")

  /** Centrality refresh over the INCREMENTALLY MAINTAINED layout
    * ([[Retrieval.graphAppendDir]] — base built from the
    * all-but-increment slice, two rows inserted via beam-searched
    * forward+reverse links): the appended nodes enter the ranking and
    * mass renormalizes over the grown set WITHOUT any NN-Descent
    * rebuild — the companion of `graph_pagerank_refined` for the add
    * half of the add-vs-train split. The oracle replays the whole
    * append construction (base pyramid + per-insert walks) and then the
    * same unrolled power iterations over the appended edge state. */
  def pageRankAppendQ(s: SparkSession, d: String): DataFrame =
    pageRank(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        s.read.parquet(s"${Retrieval.graphAppendDir(s, d)}/idx/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst")),
        iters = Iters)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"))
      .orderBy("vec_id")

  /** Takedown-aware centrality refresh — [[pageRankRefinedQ]] over the
    * TOMBSTONED at-rest layout ([[Retrieval.GraphDeletedIds]]
    * recalled): deleted docs leave the node set, neither direction of
    * their edges conducts, and the ranking renormalizes over the
    * survivors (N shrinks; a survivor that lost its whole out-list
    * becomes dangling and redistributes through the teleport — the
    * loop's dangling path exercised by real takedowns, not just
    * synthetic specs). Tombstones are honored through the shared
    * store reads, the same liveDocs discipline every index family
    * serves; the oracle replays the refined pyramid MINUS the ids. */
  def pageRankDelQ(s: SparkSession, d: String): DataFrame = {
    val (live, edges) = delLayoutLive(s, d)
    pageRank(live, edges, iters = Iters)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"))
      .orderBy("vec_id")
  }

  /** Label propagation over a (possibly tombstoned) at-rest graph
    * layout: live nodes only, and NEITHER direction of a deleted node's
    * edges conducts a vote — the takedown semantics the propagation
    * family owes (a recalled document must not keep labeling its
    * neighbors through votes it cast before the takedown). `nodes` =
    * (id, seed) PRE-takedown; deleted ids are dropped here through the
    * same [[graft.sources.Tombstones]] store every index family serves. */
  def labelPropOverLayout(s: SparkSession, nodes: DataFrame, idxDir: String,
      iters: Int): DataFrame = {
    import graft.sources.Tombstones
    val live = Tombstones.dropDeleted(nodes, col("id"), idxDir)
    val e0 = Tombstones.dropDeleted(
      Tombstones.dropDeleted(
        s.read.parquet(s"$idxDir/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst")),
        col("src"), idxDir),
      col("dst"), idxDir)
    val und = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    labelPropagation(live, und, iters)
  }

  /** Takedown-aware semi-supervised labeling — [[labelPropQ]]'s
    * semantics over the TOMBSTONED production layout
    * ([[Retrieval.graphDelIdxDir]], the same store `graph_pagerank_del`
    * refreshes from): recalled docs leave the node set AND their past
    * votes stop conducting, so a dependent whose only label source was
    * a deleted seed honestly reverts to null (or flips to the surviving
    * majority — GraphAnalyticsSpec pins the flip on a synthetic layout).
    * The oracle replays the refined pyramid minus the ids, then the
    * same unrolled vote rounds. */
  /** [[labelPropQ]] over the PRODUCTION graph — the clamped-seed
    * spread refreshed from the stored (src, dst) rows alone, no
    * blocked-kNN build per reading (the plain-vote twin of
    * [[labelPropWRefinedQ]], completing the refined column of the
    * propagation matrix). */
  def labelPropRefinedQ(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"),
      when(col("vec_id") % SeedMod === 0, col("label")).as("seed"))
    labelPropOverLayout(s, nodes,
        s"${Retrieval.graphIdxDir(s, d)}/idx", Iters)
      .select(col("id").as("vec_id"), col("lbl").as("label"),
        (col("id") % SeedMod === 0).as("is_seed"))
      .orderBy("vec_id")
  }

  def labelPropDelQ(s: SparkSession, d: String): DataFrame = {
    val nodes = delLiveEmb(s, d).select(col("id"),
      when(col("id") % SeedMod === 0, col("label")).as("seed"))
    val e0 = delLiveEdgesCos(s, d).select("src", "dst")
    val und = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    labelPropagation(nodes, und, Iters)
      .select(col("id").as("vec_id"), col("lbl").as("label"),
        (col("id") % SeedMod === 0).as("is_seed"))
      .orderBy("vec_id")
  }

  /** Global triangle census of the kNN graph's undirected closure:
    * unordered edge pairs, wedge count Σ C(deg, 2), triangle count via
    * the (a<b<c) ordered two-join (each triangle counted exactly once,
    * candidate space bounded by Σ deg² — the NoN-expansion bound, never
    * corpus²), and the global clustering coefficient 3·T / W. The
    * cohesion dial for the graph family: near-random embeddings read
    * low (neighbors of neighbors are strangers — beam search and label
    * propagation will struggle), a well-clustered corpus reads high.
    * Integer end to end until the one final division — exact replay. */
  def clusteringQ(s: SparkSession, d: String): DataFrame =
    clusteringOf(knnEdges(s, d))

  /** [[clusteringQ]]'s core over any (src, dst) edge list (direction
    * and duplicates are erased by the unordered-pair distinct). */
  def clusteringOf(edges: DataFrame): DataFrame = {
    val p = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = p.select(col("a").as("v"))
      .unionByName(p.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val wedges = deg.agg(expr("sum(dg * (dg - 1)) div 2").as("n_wedges"))
    val tri = p.as("x")
      .join(p.as("y"), col("x.b") === col("y.a"))
      .join(p.as("z"),
        col("z.a") === col("x.a") && col("z.b") === col("y.b"))
      .agg(count(lit(1)).as("n_triangles"))
    p.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(wedges)).crossJoin(broadcast(tri))
      .select(col("n_pairs"), col("n_wedges"), col("n_triangles"),
        round(lit(3) * col("n_triangles").cast("double") / col("n_wedges"), 6)
          .as("clustering_coeff"))
  }

  /** PER-NODE local clustering coefficient (Watts & Strogatz 1998) —
    * the per-doc face of [[clusteringOf]]'s global census: c(v) =
    * 2·T(v) / (deg(v)·(deg(v)−1)) with T(v) = triangles through v. The
    * per-document cohesion signal curation reads next to
    * `graph_density`: a doc whose neighbors all know each other sits
    * inside a redundant clique (the dedup families' slice); one whose
    * neighbors are mutual strangers is a hub or boundary doc whose
    * graph signals mix topics. deg < 2 ⇒ undefined — null, honestly.
    *
    * Same candidate bound as the census: triangles come from the
    * (a<b<c) ordered two-join over the unordered-pair set (Σ deg²
    * wedge candidates, never corpus²), each triangle then credited to
    * its THREE corners. Integer end to end until the one division —
    * exact replay. */
  def localClusteringOf(edges: DataFrame): DataFrame = {
    val p = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      // referenced 4× (3 joins + deg); sized cut (r21, [[cutParts]])
      .coalesce(cutParts(edges)).localCheckpoint(eager = false)
    val deg = p.select(col("a").as("v"))
      .unionByName(p.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val tri = p.as("x")
      .join(p.as("y"), col("x.b") === col("y.a"))
      .join(p.as("z"),
        col("z.a") === col("x.a") && col("z.b") === col("y.b"))
      .select(col("x.a").as("v1"), col("x.b").as("v2"), col("y.b").as("v3"))
    val perNode = tri.select(col("v1").as("v"))
      .unionByName(tri.select(col("v2").as("v")))
      .unionByName(tri.select(col("v3").as("v")))
      .groupBy("v").agg(count(lit(1)).as("__t"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("__t"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2, round(
          lit(2.0) * coalesce(col("__t"), lit(0L)) /
            (col("deg") * (col("deg") - 1)).cast("double"), 6))
          .as("local_coeff"))
  }

  /** [[localClusteringOf]] over the kNN graph: (vec_id, deg,
    * n_triangles, local_coeff) for every node with ≥ 1 edge. */
  def clusteringLocalQ(s: SparkSession, d: String): DataFrame =
    localClusteringOf(knnEdges(s, d))
      .select(col("v").as("vec_id"), col("deg"), col("n_triangles"),
        col("local_coeff"))
      .orderBy("vec_id")

  /** [[clusteringQ]] over the PRODUCTION graph — the cohesion dial
    * refreshed from the stored (src, dst) rows alone (the
    * `graph_density_refined` payoff for the census): no blocked-kNN
    * build per reading. */
  def clusteringRefinedQ(s: SparkSession, d: String): DataFrame =
    clusteringOf(storedEdges(s, d))

  /** Takedown-aware census — [[clusteringQ]] over the TOMBSTONED
    * layout's surviving edges: a recalled doc's triangles stop
    * counting (every wedge and triangle through it leaves the census),
    * closing the takedown matrix for the global cohesion dial. */
  def clusteringDelQ(s: SparkSession, d: String): DataFrame = {
    val (_, e0) = delLayoutLive(s, d)
    clusteringOf(e0)
  }

  /** [[clusteringLocalQ]] over the PRODUCTION graph — the per-doc
    * cohesion dial refreshed from the stored (src, dst) rows alone (no
    * blocked-kNN build per reading), and the derivation the widened
    * stats store serves per doc ([[statsSignals]]). */
  def clusteringLocalRefinedQ(s: SparkSession, d: String): DataFrame =
    localClusteringOf(storedEdges(s, d))
      .select(col("v").as("vec_id"), col("deg"), col("n_triangles"),
        col("local_coeff"))
      .orderBy("vec_id")

  /** Takedown-aware per-node cohesion — [[clusteringLocalQ]] over the
    * TOMBSTONED layout: a triangle corner whose third corner was
    * recalled honestly loses that triangle (its coefficient drops, or
    * nulls if its degree falls under 2), and recalled ids emit no row
    * (they keep no edges, and [[localClusteringOf]] only speaks for
    * nodes with ≥ 1 edge). */
  def clusteringLocalDelQ(s: SparkSession, d: String): DataFrame = {
    val (_, e0) = delLayoutLive(s, d)
    localClusteringOf(e0)
      .select(col("v").as("vec_id"), col("deg"), col("n_triangles"),
        col("local_coeff"))
      .orderBy("vec_id")
  }

  /** Connected components of the UNDIRECTED closure of `edges`,
    * restricted to `nodes` = (id): (id, component) for EVERY node, with
    * component = the smallest node id in its component (an isolated
    * node is its own singleton component — the row [[Dedup.dupClusters]]
    * by construction cannot emit, added back here by the left join).
    *
    * The propagation engine IS [[Dedup.dupClusters]] — pointer-jumping
    * min-label propagation with per-round convergence detection and the
    * driver union-find fast path below its edge threshold — reused
    * rather than re-grown: components over a similarity graph and
    * transitive near-dup clustering are the same computation, and the
    * graph face should share the dedup face's hardening (statsReset,
    * loud non-convergence, byte-identical fast-path parity). Edges are
    * semi-joined to the node set on BOTH endpoints first (the
    * [[prIterate]] conservation discipline): an outside endpoint would
    * otherwise conduct labels into — or worse, BECOME the min label of
    * — a component it is not a member of. Every round is keyed by id
    * and bounded by |E|; min is order-independent integer arithmetic,
    * so no float fold discipline is needed and the result is exact. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 20,
      maxDriverEdges: Long = 2L * 1000 * 1000): DataFrame = {
    val ids = nodes.select(col("id").cast("long").as("id"))
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
    val cc = Dedup.dupClusters(
      e.select(col("src").as("doc_a"), col("dst").as("doc_b")),
      maxRounds = maxRounds, maxDriverEdges = maxDriverEdges)
    ids.join(cc.select(col("doc_id").as("id"), col("cluster")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("component"))
  }

  /** `rounds` peel iterations toward the k-core of the undirected
    * closure (Seidman 1983; the fixed-iteration discipline of every
    * loop here — [[pageRank]] publishes 3 power rounds, this publishes
    * `rounds` peels): each round drops every node whose degree within
    * the surviving set is < k; at the fixpoint the survivors are
    * exactly the k-core (a spec asserts the named query's round count
    * converges at the test SF — one more round changes nothing).
    * Peeling is monotone (a dropped node never returns), so `rounds`
    * only ever under-peels, never mislabels a true core member.
    *
    * Output: (id, in_core, core_deg) for every node — in_core =
    * survived all rounds; core_deg = degree within the FINAL surviving
    * set (null for peeled nodes, and for a survivor none of whose
    * neighbors survived the last round — possible only pre-fixpoint).
    * Per round: one |E|-bounded double semi-join + one count aggregate
    * per node (map-side combined, no collect_list — a mega-hub degree
    * is a partial-agg sum, never one task's array). Integer end to end
    * → exact unrolled replay.
    *
    * Lineage: each round's survivor set is referenced TWICE by the next
    * round's degree join (both semi-join sides), so an uncut chain
    * DOUBLES per round — 2^rounds plan growth, measured 10.5s → 2.5s at
    * sf0.1 for the named query. Both the closure and the loop-carried
    * set are therefore cut with LAZY localCheckpoints (`eager = false`:
    * plan construction runs no job — the deferred-view contract — the
    * first action materializes, every later reference reuses blocks). */
  def kcorePeel(nodes: DataFrame, edges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"kcorePeel: k >= 1, got $k")
    require(rounds >= 1, s"kcorePeel: rounds >= 1, got $rounds")
    val ids = nodes.select(col("id").cast("long").as("id"))
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
    // Cuts coalesced to data-proportional counts (r21, [[cutParts]]):
    // und ≤ 2|E| rows, each round's survivor set ≤ |V|.
    val nV = cutParts(nodes)
    val nE = cutParts(edges)
    val und = sizedCut(e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"))).distinct(), nE)
    def degWithin(live: DataFrame): DataFrame = und
      .join(live.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(live.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("__deg"))
    var live = ids
    for (_ <- 1 to rounds) {
      live = sizedCut(
        degWithin(live).filter(col("__deg") >= k).select("id"), nV)
    }
    ids.join(live.select(col("id"), lit(true).as("in_core")), Seq("id"), "left")
      .join(degWithin(live).select(col("id"), col("__deg").as("core_deg")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("in_core"), lit(false)).as("in_core"),
        when(col("in_core"), col("core_deg")).as("core_deg"))
  }

  private val QualitySeedMfx = 500000L // |NB margin| ≥ 0.5 → confident seed

  /** Semi-supervised QUALITY spreading — the two families composed:
    * the NB classifier's CONFIDENT verdicts (|fixed-point margin| ≥
    * [[QualitySeedMfx]]) become clamped seeds, and their binary quality
    * label propagates over the similarity graph to the low-confidence
    * docs the margin alone can't call. Integer end to end (fixed-point
    * margins in, majority votes through), so the whole composition —
    * NB training included — replays exactly. Docs without an embedding
    * row keep their seed verdict (no edges reach them): the honest
    * semantics when the embedded slice lags the corpus. Returns
    * (id, lbl, seed, __mfx). */
  /** The NB seed table, built once per (JVM, sfDir) into scratch
    * parquet ([[graft.plans.Scratch]] — r20; the r19 lazy checkpoint
    * died under the bench's per-rep unpersist) and shared by BOTH
    * quality-prop bindings (verdict + meter) — the NB train+score
    * pipeline runs once, not per binding. The NB lineage (tokenize →
    * score join → margin agg) is referenced by every vote round plus
    * the final margin join, so materializing it once is what keeps the
    * loop |E|-bounded. */
  private def qualityNodes(s: SparkSession, d: String): DataFrame =
    graft.plans.Scratch.frame(s, s"qualitynodes|$d") {
      val docs = Tables.documents(s, d)
      val (llr, scalars) = Classify.nbModel(
        docs.filter(Classify.isTrain(col("doc_id"))),
        col("text"), col("lang") === "en")
      val scored = Classify.nbScoreRaw(docs, col("doc_id"), col("text"),
        llr, scalars)
      scored.select(col("doc_id").as("id"),
        when(abs(col("__mfx")) >= QualitySeedMfx,
          when(col("__mfx") > 0L, 1).otherwise(0)).as("seed"),
        col("__mfx"))
    }

  private def qualityPropLabels(s: SparkSession, d: String): DataFrame = {
    val nodes = qualityNodes(s, d)
    val e = knnEdges(s, d)
    val und = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    labelPropagation(nodes.select("id", "seed"), und, iters = Iters)
      .join(nodes, "id") // seed + __mfx both ride the checkpointed table
  }

  /** Per-doc propagated quality verdict (1 = en-like by the NB gate's
    * own confident neighbors), null where neither confidence nor any
    * labeled neighbor ever reached the doc. */
  def qualityPropQ(s: SparkSession, d: String): DataFrame =
    qualityPropLabels(s, d)
      .select(col("id").as("doc_id"), col("lbl").as("quality"),
        col("seed").isNotNull.as("is_seed"))
      .orderBy("doc_id")

  /** Meter: on non-seed docs that received a propagated label, how
    * often the graph's verdict agrees with the NB margin's own
    * (low-confidence) sign — high agreement says the graph spreads the
    * classifier's signal rather than fighting it. */
  def qualityPropAccQ(s: SparkSession, d: String): DataFrame =
    qualityPropLabels(s, d)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("seed").isNotNull, 1L).otherwise(0L)).as("n_seed"),
        sum(when(col("seed").isNull && col("lbl").isNotNull, 1L)
          .otherwise(0L)).as("n_prop"),
        sum(when(col("seed").isNull &&
            col("lbl") === when(col("__mfx") > 0L, 1).otherwise(0), 1L)
          .otherwise(0L)).as("n_agree"))
      .select(col("n_docs"), col("n_seed"), col("n_prop"), col("n_agree"),
        round(col("n_agree").cast("double") / col("n_prop"), 6)
          .as("agree_rate"))

  /** (vec_id, component, comp_size) over any node/edge pair — shared by
    * the in-plan and tombstoned component queries. */
  private def componentsWithSizes(nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    val comp = connectedComponents(nodes, edges)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("comp_size"))
    comp.join(sizes, "component")
      .select(col("id").as("vec_id"), col("component"), col("comp_size"))
  }

  /** Connected components of the kNN graph's undirected closure:
    * (vec_id, component, comp_size), component = min member id. The
    * corpus-fragmentation map the graph family reads before trusting
    * any propagation result — PageRank mass, labels and beam walks
    * cannot cross component boundaries, so a fragmented graph means
    * per-component signals, not corpus-level ones. (The same primitive
    * clusters transitive near-dups — [[Dedup.dupClusters]] — here it
    * runs on the similarity graph itself.) */
  def componentsQ(s: SparkSession, d: String): DataFrame =
    componentsWithSizes(
        Tables.embeddings(s, d).select(col("vec_id").as("id")),
        knnEdges(s, d))
      .orderBy("vec_id")

  /** The fragmentation profile: component size → how many components.
    * One row per distinct size — the honest summary of how connected
    * the corpus graph actually is (a healthy blocked-kNN corpus reads
    * few large components; a long tail of small ones flags isolated
    * slices no propagation signal will ever reach). */
  def componentsHistQ(s: SparkSession, d: String): DataFrame =
    connectedComponents(
        Tables.embeddings(s, d).select(col("vec_id").as("id")),
        knnEdges(s, d))
      .groupBy("component").agg(count(lit(1)).as("comp_size"))
      .groupBy("comp_size").agg(count(lit(1)).as("n_components"))
      .orderBy("comp_size")

  /** Takedown-aware components — [[componentsQ]] over the TOMBSTONED
    * at-rest layout ([[Retrieval.graphDelIdxDir]], the store
    * `graph_pagerank_del` refreshes from): recalled docs leave the node
    * set and neither direction of their edges connects, so a component
    * whose only bridge was a deleted doc honestly SPLITS — the
    * structural face of a takedown (`graph_pagerank_del` shows the
    * mass face). Same Tombstones reads as every index family. */
  /** [[componentsQ]] over the PRODUCTION graph — the fragmentation
    * profile refreshed from the stored (src, dst) rows alone, no
    * blocked-kNN build per reading (the structural face of the clean
    * at-rest serving story; its del and append twins already read
    * their layouts). */
  def componentsRefinedQ(s: SparkSession, d: String): DataFrame =
    componentsWithSizes(
        Tables.embeddings(s, d).select(col("vec_id").as("id")),
        storedEdges(s, d))
      .orderBy("vec_id")

  def componentsDelQ(s: SparkSession, d: String): DataFrame = {
    val (live, edges) = delLayoutLive(s, d)
    componentsWithSizes(live, edges).orderBy("vec_id")
  }

  /** Components over the INCREMENTALLY MAINTAINED layout
    * ([[Retrieval.graphAppendDir]] — the store `graph_pagerank_append`
    * ranks from): the appended nodes join their components through the
    * beam-searched forward+reverse links written at insert time, with
    * no NN-Descent rebuild — the structural face of the add half of the
    * add-vs-train split (`graph_components_del` is the delete half). An
    * insert whose links all land in one component joins it; links into
    * two components MERGE them — exactly what reverse edges are for. */
  def componentsAppendQ(s: SparkSession, d: String): DataFrame =
    componentsWithSizes(
        Tables.embeddings(s, d).select(col("vec_id").as("id")),
        s.read.parquet(s"${Retrieval.graphAppendDir(s, d)}/idx/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst")))
      .orderBy("vec_id")

  /** The INCREMENTALLY MAINTAINED layout's stored edge list — what
    * every `_append` structure arm reads (base build + per-insert
    * beam-searched forward/reverse links, no rebuild). */
  private def appendEdges(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${Retrieval.graphAppendDir(s, d)}/idx/edges")
      .select(col("__vid").as("src"), col("nbr_id").as("dst"))

  /** [[kcoreQ]] over the INCREMENTALLY MAINTAINED layout: an inserted
    * doc joins the core iff its insert-time links give it (and keep
    * its neighbors) ≥ k within-core support — the cohesion face of the
    * add half of the add-vs-train split. Same convergence guard. */
  def kcoreAppendQ(s: SparkSession, d: String): DataFrame =
    kcoreConverged(
        kcorePeel(Tables.embeddings(s, d).select(col("vec_id").as("id")),
          appendEdges(s, d), k = CoreK, rounds = PeelRounds),
        k = CoreK, rounds = PeelRounds)
      .select(col("id").as("vec_id"), col("in_core"), col("core_deg"))
      .orderBy("vec_id")

  /** [[harmonicQ]] over the INCREMENTALLY MAINTAINED layout: inserted
    * docs enter every ring they now reach, and their insert-time links
    * shorten survivors' distances — reach refreshed with no rebuild. */
  def harmonicAppendQ(s: SparkSession, d: String): DataFrame =
    harmonic3(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        appendEdges(s, d))
      .select(col("id").as("vec_id"), col("n1"), col("n2"), col("n3"),
        col("harmonic"))
      .orderBy("vec_id")

  /** [[communitiesQ]] over the INCREMENTALLY MAINTAINED layout: an
    * inserted doc adopts (or seeds) a community through its insert-time
    * links — detection refreshed over the appended edge state. */
  def communitiesAppendQ(s: SparkSession, d: String): DataFrame =
    communitiesOverLayout(s,
        Tables.embeddings(s, d).select(col("vec_id").as("id")),
        s"${Retrieval.graphAppendDir(s, d)}/idx", Iters)
      .select(col("id").as("vec_id"), col("lbl").as("community"),
        col("comm_size"))
      .orderBy("vec_id")

  private val HarmonicHops = 3 // the published reach horizon

  /** Bounded-hop harmonic centrality over the undirected closure:
    * (vec_id, n1, n2, n3, harmonic) with n_h = |{v : dist(u,v) = h}|
    * and harmonic = Σ_h n_h / h — the truncated form of the
    * harmonic-centrality signal web-corpus curation filters on
    * (CommonCrawl publishes per-host harmonic centrality; Boldi &
    * Vigna 2014 argue it over closeness for disconnected graphs, which
    * a kNN corpus graph IS — see `graph_components`). Truncation at
    * [[HarmonicHops]] is the published semantics, not an
    * approximation of something else: far mass contributes ≤ 1/4 per
    * node anyway, and the bounded form is exactly replayable.
    *
    * Scale: reach sets grow to N · min(k·(k-1)^(h-1)+…, N) rows —
    * BOUNDED per node by the out-degree cap (k = 3 ⇒ ≤ ~40 members at
    * h = 3), so the three expansion joins and the distinct are all
    * ~linear in N at fixed k. (Unbounded-h centrality at web scale
    * wants the HyperBall register-sketch formulation — out of scope
    * while every served graph here is degree-capped.) The harmonic sum
    * is THREE terms in a fixed order (n1 + n2/2 + n3/3, each a single
    * IEEE-754 op on integer-valued doubles), so no ordered-fold
    * machinery is needed for bit parity. */
  def harmonicQ(s: SparkSession, d: String): DataFrame =
    harmonic3(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        knnEdges(s, d))
      .select(col("id").as("vec_id"), col("n1"), col("n2"), col("n3"),
        col("harmonic"))
      .orderBy("vec_id")

  /** [[harmonicQ]]'s core over any (id) / (src, dst) pair — the
    * undirected closure is taken here. Returns (id, n1, n2, n3,
    * harmonic) for every node (an isolated node reads all-zero). */
  def harmonic3(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val ids = nodes.select(col("id").cast("long").as("id"))
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
    // Cuts coalesced to data-proportional counts (r21, [[cutParts]]).
    // The per-hop reach set grows toward |V|·reach(h), so each hop's cut
    // is sized from ITS OWN plan estimate (floored at the input-derived
    // counts — an unknown estimate must never shrink a big frame).
    val nV = cutParts(nodes)
    val nE = cutParts(edges)
    val und = sizedCut(e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"))).distinct(), nE)
    // cumulative reach R_h = R_{h-1} ∪ (R_{h-1} ⋈ edges), distinct;
    // sizes are cumulative counts INCLUDING self (dist 0). Each R_h is
    // referenced three times (union side, expansion side, its own size
    // count), so the chain is cut per hop with lazy checkpoints — the
    // kcorePeel lineage note applies verbatim.
    var reach = ids.select(col("id"), col("id").as("m"))
    val sizes = (1 to HarmonicHops).map { h =>
      val grown = reach.unionByName(
          reach.join(und.select(col("src").as("m"), col("dst")), "m")
            .select(col("id"), col("dst").as("m")))
        .distinct()
      reach = sizedCut(grown, cutParts(grown).max(nV).max(nE))
      reach.groupBy("id").agg(count(lit(1)).as(s"__s$h"))
    }
    sizes.foldLeft(ids)((acc, sz) => acc.join(sz, "id"))
      .select(col("id"),
        (col("__s1") - 1L).as("n1"),
        (col("__s2") - col("__s1")).as("n2"),
        (col("__s3") - col("__s2")).as("n3"))
      .withColumn("harmonic", round(
        col("n1") + col("n2") / lit(2.0) + col("n3") / lit(3.0), 6))
  }

  private val SketchK = 16 // graph_harmonic_sketch's published register width

  /** UNBOUNDED-working-set harmonic centrality — the HyperBall
    * formulation (Boldi & Vigna 2013) of [[harmonic3]], with KMV
    * bottom-k registers in place of HyperLogLog counters: each node
    * carries the k smallest md5-uniform hashes of its cumulative reach
    * set, hop h merges every node's register with its neighbors'
    * (bottom-k of a union = bottom-k of the parts' bottom-ks — the
    * [[graft.functions.BottomKAgg]] mergeability), and |R_h| is
    * estimated as (k−1)/u₍ₖ₎ (Bar-Yossef 2002), EXACT below k where the
    * register IS the set.
    *
    * Why this exists next to the exact form: [[harmonic3]] materializes
    * cumulative reach SETS — O(N·min(k_deg^h, N)) rows, fine at the
    * served degree caps (~40/node) but the one structure operator whose
    * working set explodes on a production k=32 graph (~33k rows/node at
    * h=3). Here the per-node state is ≤ [[SketchK]] doubles at EVERY
    * hop and degree: the hop join carries ≤ |E|·k values into map-side
    * partial buffers (the Aggregator bounds each partial at k — a
    * mega-hub's fan-in never lands in one task's array), so per-hop row
    * growth is flat in N — the 100 TB path CommonCrawl-style centrality
    * actually needs.
    *
    * DETERMINISTIC and fully oracle-checked, unlike HLL: the hash is
    * the repo's md5-uniform and bottom-k-of-a-set is order-free, so
    * DuckDB replays the registers off the materialized reach sets (tiny
    * at oracle SF) and every estimate matches bit-for-bit — the
    * `agg_distinct_kmv` discipline lifted to per-node per-hop state.
    * Estimates are monotone in h (registers only grow), so the per-ring
    * differences n̂_h are never negative. Output: (id, n1_est, n2_est,
    * n3_est, harmonic_est); exact-parity: every node whose true
    * [[HarmonicHops]]-reach holds < k members reads EXACTLY its
    * [[harmonic3]] row (the spec pins it at k ≥ corpus reach). */
  def harmonicSketch(nodes: DataFrame, edges: DataFrame,
      k: Int = SketchK): DataFrame = {
    require(k >= 2, s"harmonicSketch: k >= 2, got $k")
    val ids = nodes.select(col("id").cast("long").as("id"))
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
    // Cuts coalesced to data-proportional counts (r21, [[cutParts]]):
    // und ≤ 2|E|; each hop's register table is exactly one row per node
    // (≤ k doubles each), so nV bounds it within the constant k.
    val nV = cutParts(nodes)
    val nE = cutParts(edges)
    val und = sizedCut(e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"))).distinct(), nE)
    val bk = graft.functions.BottomKAgg.bottomKDistinct(k)
    // register state as exploded (id, u) pairs — ≤ k rows per node
    var pairs = ids.select(col("id"),
      graft.functions.HashFunctions.md5UniformOpen(col("id")).as("u"))
    val ests = (1 to HarmonicHops).map { h =>
      val regs = sizedCut(pairs.unionByName(
          pairs.select(col("id").as("src"), col("u"))
            .join(und, "src").select(col("dst").as("id"), col("u")))
        .groupBy("id").agg(bk(col("u")).as("reg")),
        nV) // referenced by est AND next hop
      pairs = regs.select(col("id"), explode(col("reg")).as("u"))
      // m < k ⇒ the register is the whole reach set: exact count.
      // Saturated ⇒ the KMV estimator off the k-th minimum.
      regs.select(col("id"),
        when(size(col("reg")) < k, size(col("reg")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("reg"), -1))
          .as(s"__e$h"))
    }
    ests.reduceLeft((a, b) => a.join(b, "id"))
      .select(col("id"),
        round(col("__e1") - lit(1.0), 6).as("n1_est"),
        round(col("__e2") - col("__e1"), 6).as("n2_est"),
        round(col("__e3") - col("__e2"), 6).as("n3_est"),
        round((col("__e1") - lit(1.0)) + (col("__e2") - col("__e1")) / lit(2.0)
          + (col("__e3") - col("__e2")) / lit(3.0), 6).as("harmonic_est"))
  }

  /** [[harmonicQ]]'s sketch twin over the same kNN graph — the same
    * rings through [[SketchK]]-wide registers, served beside the exact
    * row so the two relations diff directly (nodes with reach < k match
    * exactly; saturated nodes carry the self-graded estimator). */
  def harmonicSketchQ(s: SparkSession, d: String): DataFrame =
    harmonicSketch(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        knnEdges(s, d), k = SketchK)
      .select(col("id").as("vec_id"), col("n1_est"), col("n2_est"),
        col("n3_est"), col("harmonic_est"))
      .orderBy("vec_id")

  /** [[harmonicQ]] over the PRODUCTION graph — the exact three-ring
    * reach read off the stored (src, dst) rows, no blocked-kNN build
    * per reading. */
  def harmonicRefinedQ(s: SparkSession, d: String): DataFrame =
    harmonic3(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        storedEdges(s, d))
      .select(col("id").as("vec_id"), col("n1"), col("n2"), col("n3"),
        col("harmonic"))
      .orderBy("vec_id")

  /** [[harmonicSketchQ]] over the PRODUCTION graph — the operator that
    * exists FOR 100 TB (flat N·k per-hop state where the exact form's
    * reach sets explode at production degree caps) now serves from the
    * 100 TB artifact: registers merged along the STORED edges, same
    * estimator, same bit-exact md5 registers. */
  def harmonicSketchRefinedQ(s: SparkSession, d: String): DataFrame =
    harmonicSketch(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        storedEdges(s, d), k = SketchK)
      .select(col("id").as("vec_id"), col("n1_est"), col("n2_est"),
        col("n3_est"), col("harmonic_est"))
      .orderBy("vec_id")

  /** Takedown-aware sketch centrality — [[harmonicSketchRefinedQ]]
    * with tombstones honored: recalled ids leave the node set, their
    * hashes leave every register they'd have seeded, and estimates
    * shrink where reach ran through them. */
  def harmonicSketchDelQ(s: SparkSession, d: String): DataFrame = {
    val (live, e0) = delLayoutLive(s, d)
    harmonicSketch(live, e0, k = SketchK)
      .select(col("id").as("vec_id"), col("n1_est"), col("n2_est"),
        col("n3_est"), col("harmonic_est"))
      .orderBy("vec_id")
  }

  /** Synchronous label-propagation COMMUNITY detection (Raghavan et al.
    * 2007), `iters` fixed rounds: every node starts as its own label
    * and each round adopts the (count desc, label asc) argmax over its
    * in-neighbor labels — UNCLAMPED, unlike [[labelPropagation]]'s
    * semi-supervised form, so labels coarsen toward dense subgroups.
    * Communities are the density face of graph structure where
    * [[connectedComponents]] is the connectivity face: one component
    * often holds several communities, and curation reads them as the
    * "topic-ish" grouping that needs no k. Fixed rounds + integer
    * tie-breaks ⇒ exact unrolled replay (the [[pageRank]] discipline);
    * a node with no in-neighbors keeps its current label. Per round:
    * one |E|-keyed join, one (dst, label) count, one per-dst argmax
    * window; the loop-carried table is cut per round with a lazy
    * checkpoint (it is referenced twice per round — the [[kcorePeel]]
    * lineage note).
    *
    * PRECONDITION: `edges` must be a SET of (src, dst) pairs — votes
    * are counted per edge ROW with no distinct here, so a duplicated
    * row double-weights its vote (multiplicity = vote weight). Every
    * oracle replay assumes set semantics (the UNION closures), and all
    * query-path callers pass deduped closures; pass a multigraph only
    * if weighted voting by multiplicity is what you mean. */
  def communityLabelProp(nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"communityLabelProp: iters >= 1, got $iters")
    val base = nodes.select(col("id").cast("long").as("id"))
    // Cuts coalesced to data-proportional counts (r21, [[cutParts]]).
    val nV = cutParts(nodes)
    val nE = cutParts(edges)
    val e = sizedCut(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .join(base.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(base.select(col("id").as("dst")), Seq("dst"), "left_semi"), nE)
    val w = Window.partitionBy("dst").orderBy(desc("__c"), asc("__vl"))
    var lbl = base.select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to iters) {
      val cand = e
        .join(lbl.select(col("id").as("src"), col("lbl").as("__vl")), "src")
        .groupBy("dst", "__vl").agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("dst").as("id"), col("__vl").as("__cand"))
      lbl = sizedCut(lbl.join(cand, Seq("id"), "left")
        .select(col("id"), coalesce(col("__cand"), col("lbl")).as("lbl")), nV)
    }
    lbl
  }

  /** Newman modularity of a partition, EXACT RATIONAL form: with
    * m2 = the undirected stub count, in_c = stubs with both endpoints
    * in community c and deg_c = stubs with source in c,
    * Q = Σ_c (in_c·m2 − deg_c²) / m2² — the numerator is a pure INTEGER
    * sum (order-free), the one division is the only float op, so the
    * replay is bit-exact with no fold machinery. Long bound: the
    * numerator terms are ≤ m2², so this holds to ~3·10⁹ stubs — and the
    * bound is GUARDED in-plan (`assert_true` on the m2 scalar, the
    * repo's fail-loudly convention): beyond it Spark's non-ANSI Long
    * arithmetic would wrap silently and return a wrong Q rather than an
    * error. Graphs past the bound want the double formulation.
    * `communities` = (id, lbl); `edges` = (src, dst), closure taken
    * here. Output: one row (n_communities, m2, q_num, modularity) —
    * n_communities counts communities owning ≥ 1 stub (an isolated
    * node's singleton community has in = deg = 0: a zero term, and
    * honestly absent from the count). */
  def modularityOf(communities: DataFrame, edges: DataFrame): DataFrame = {
    val cm = communities.select(col("id").cast("long").as("id"),
      col("lbl").cast("long").as("__cm"))
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .join(cm.select(col("id").as("src"), col("__cm").as("__ca")), "src")
      .join(cm.select(col("id").as("dst"), col("__cm").as("__cb")), "dst")
      // referenced 3× (m2, per-community, Σ); sized cut (r21,
      // [[cutParts]] — ≤ 2|E| rows)
      .coalesce(cutParts(edges)).localCheckpoint(eager = false)
    // loud Long-overflow guard: in_c·m2 and deg_c² are ≤ m2², so m2 <
    // 3·10⁹ keeps every numerator term under 2⁶³ with headroom for the
    // Σ_c sum. NOTE the margin is thin by design — m2² < 9.0·10¹⁸ vs
    // Long.MaxValue ≈ 9.22·10¹⁸ (~2.4%) — so do NOT loosen the 3e9
    // constant (or widen any numerator term, e.g. weighted stubs)
    // without re-deriving the bound. assert_true keeps the check
    // IN-PLAN (no job at plan
    // construction); the filter is identically true below the bound, so
    // the guarded relation is the unguarded one and the oracle replay
    // is untouched.
    val m2df = und.agg(count(lit(1)).as("__m2"))
      .filter(assert_true(col("__m2") < lit(3000000000L),
        lit("modularityOf: stub count exceeds the exact-Long bound " +
          "(~3e9); use a double formulation")).isNull)
    val per = und.groupBy(col("__ca").as("__cm"))
      .agg(count(lit(1)).as("__deg"),
        sum(when(col("__ca") === col("__cb"), 1L).otherwise(0L)).as("__in"))
    per.crossJoin(broadcast(m2df))
      .agg(count(lit(1)).as("n_communities"),
        max(col("__m2")).as("m2"),
        sum(col("__in") * col("__m2") - col("__deg") * col("__deg"))
          .as("q_num"))
      .select(col("n_communities"), col("m2"), col("q_num"),
        round(col("q_num").cast("double") /
          (col("m2") * col("m2")).cast("double"), 6).as("modularity"))
  }

  /** Degree assortativity (Newman 2002) of the undirected closure: the
    * Pearson correlation of endpoint degrees over directed edge stubs,
    * r = (M·Σxy − Σx·Σy) / (M·Σxx − Σx²) with x, y the endpoint
    * degrees of each directed stub and M the stub count (the closure
    * carries both directions, so Σx = Σy and Σxx = Σyy and the usual
    * two-sided denominator collapses). The degree-MIXING dial next to
    * `graph_clustering`'s cohesion dial: disassortative (r < 0) is the
    * normal kNN-graph shape (hubs collect leaves); a strongly
    * assortative read says redundancy is clumping into hub-hub cores —
    * the slice the dedup family should look at first.
    *
    * Every sum is INTEGER (degrees, their products — longs end to end),
    * so the one final expression is a fixed sequence of exact-input
    * IEEE-754 ops and the replay is bit-exact with no fold discipline.
    * One |E|-bounded degree join per side + one global aggregate; the
    * long sums bound: M·Σxy ≤ M²·maxdeg² — GUARDED in-plan below
    * (assert_true on m·maxdeg < 2³¹, fail-loud), identically true for
    * any degree-capped graph this engine serves. */
  def assortativityOf(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val deg = und.groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
    und
      .join(deg.select(col("v").as("src"), col("dg").as("__x")), "src")
      .join(deg.select(col("v").as("dst"), col("dg").as("__y")), "dst")
      .agg(count(lit(1)).as("m"),
        sum(col("__x")).as("sx"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__x") * col("__y")).as("sxy"),
        max(col("__x")).as("__mx"))
      // loud Long-overflow guard (the modularityOf convention): every
      // term below — the sums AND the final M·Σxy products — is ≤
      // M²·maxdeg², so M·maxdeg < 2³¹ keeps it under 2⁶²; checked in
      // double so the guard itself can't wrap. Identically true for any
      // degree-capped graph this engine serves; in-plan, no job.
      .filter(assert_true(
        coalesce(col("m").cast("double") * col("__mx").cast("double"),
          lit(0.0)) < lit(2147483648.0),
        lit("assortativityOf: m * maxdeg exceeds the exact-Long bound " +
          "(2^31); use a double formulation")).isNull)
      .select(col("m"), col("sx"), col("sxx"), col("sxy"),
        // a REGULAR graph has zero degree variance: the denominator is
        // 0 and mixing is undefined — null, honestly (ANSI divide would
        // otherwise throw; the guard also keeps the branch short-
        // circuited so the division never runs on the degenerate case)
        round(when(col("m") * col("sxx") =!= col("sx") * col("sx"),
            (col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
              (col("m") * col("sxx") - col("sx") * col("sx")).cast("double")),
          6).as("assortativity"))
  }

  /** [[assortativityOf]] over the kNN graph — one exact row. */
  def assortativityQ(s: SparkSession, d: String): DataFrame =
    assortativityOf(knnEdges(s, d))

  /** [[assortativityQ]] over the PRODUCTION graph — the degree-mixing
    * dial refreshed from the stored (src, dst) rows alone. */
  def assortativityRefinedQ(s: SparkSession, d: String): DataFrame =
    assortativityOf(storedEdges(s, d))

  /** Takedown-aware degree mixing — [[assortativityQ]] over the
    * TOMBSTONED layout: a recalled hub's stubs leave both sides of
    * every degree product, so the mixing verdict regrades over the
    * surviving graph (a takedown that removes the hub-hub redundancy
    * core flips an assortative read back toward the normal
    * disassortative kNN shape). */
  def assortativityDelQ(s: SparkSession, d: String): DataFrame = {
    val (_, e0) = delLayoutLive(s, d)
    assortativityOf(e0)
  }

  /** The LPA label tables both community faces and their modularity
    * meters consume, built ONCE per (JVM, sfDir) into scratch parquet
    * ([[graft.plans.Scratch]] — r20; r19's session-keyed lazy
    * checkpoints died under the bench's per-rep unpersist, see the
    * Scratch doc): the partition and its grade are two reads of ONE
    * detection run (exactly how production would grade a partition it
    * just computed), so the [[Iters]] vote rounds don't re-run per
    * binding. Values are unchanged — the stored table IS the same
    * deterministic derivation. */
  private def communityLabels(s: SparkSession, d: String): DataFrame =
    graft.plans.Scratch.frame(s, s"lpaclean|$d") {
      val e = knnEdges(s, d)
      val und = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      communityLabelProp(
        Tables.embeddings(s, d).select(col("vec_id").as("id")), und, Iters)
    }

  /** Cached takedown-layout LPA labels (id, lbl) + the live edge set
    * they were detected on (the modularity meter grades against it). */
  private def delCommunityLabels(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val labels = graft.plans.Scratch.frame(s, s"lpadel|$d") {
      val (live, e0) = delLayoutLive(s, d)
      val und = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      communityLabelProp(live, und, Iters)
    }
    val (_, e0) = delLayoutLive(s, d)
    (labels, e0)
  }

  /** Cached clean-layout LPA labels (id, lbl) + the stored edge set —
    * [[delCommunityLabels]]'s clean twin (the stats serving store's
    * derivation, exposed as named queries). */
  private def refinedCommunityLabels(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val labels = graft.plans.Scratch.frame(s, s"lparefined|$d") {
      val e0 = storedEdges(s, d)
      val und = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      communityLabelProp(
        Tables.embeddings(s, d).select(col("vec_id").as("id")), und, Iters)
    }
    (labels, storedEdges(s, d))
  }

  /** The kNN graph's community partition — [[communityLabelProp]] over
    * the undirected closure, [[Iters]] rounds: (vec_id, community,
    * comm_size). Where `graph_components` answers "can signals reach",
    * this answers "where do they pool". */
  def communitiesQ(s: SparkSession, d: String): DataFrame = {
    val cm = communityLabels(s, d)
    cm.groupBy("lbl").agg(count(lit(1)).as("comm_size"))
      .join(cm, "lbl")
      .select(col("id").as("vec_id"), col("lbl").as("community"),
        col("comm_size"))
      .orderBy("vec_id")
  }

  /** [[communitiesQ]] over the PRODUCTION graph — detection refreshed
    * from the stored (src, dst) rows (the derivation the centrality
    * serving store reads, exposed as a named oracle-checked query). */
  def communitiesRefinedQ(s: SparkSession, d: String): DataFrame = {
    val (cm, _) = refinedCommunityLabels(s, d)
    cm.groupBy("lbl").agg(count(lit(1)).as("comm_size"))
      .join(cm, "lbl")
      .select(col("id").as("vec_id"), col("lbl").as("community"),
        col("comm_size"))
      .orderBy("vec_id")
  }

  /** One exact row grading [[communitiesQ]]'s partition:
    * [[modularityOf]] over the same graph — the standard "did LPA find
    * real structure" meter (Q ≈ 0 = no better than random mixing). */
  def modularityQ(s: SparkSession, d: String): DataFrame =
    modularityOf(communityLabels(s, d), knnEdges(s, d))

  /** [[modularityQ]] grading [[communitiesRefinedQ]]'s partition over
    * the same stored edges — did detection over the at-rest layout
    * keep real structure. */
  def modularityRefinedQ(s: SparkSession, d: String): DataFrame = {
    val (labels, e0) = refinedCommunityLabels(s, d)
    modularityOf(labels, e0)
  }

  /** The takedown partition graded — [[modularityOf]] over
    * [[communitiesDelQ]]'s surviving graph and labels: did the
    * re-coarsened partition keep real structure after the recall, or
    * did the deletions break the communities' cohesion (Q collapsing
    * toward 0 is the signal to re-run detection at more rounds). */
  def modularityDelQ(s: SparkSession, d: String): DataFrame = {
    val (labels, e0) = delCommunityLabels(s, d)
    modularityOf(labels, e0)
  }

  /** Takedown-aware communities — [[communitiesQ]]'s semantics over the
    * TOMBSTONED production layout ([[Retrieval.graphDelIdxDir]], the
    * same store `graph_pagerank_del` / `graph_label_prop_del` serve):
    * recalled docs leave the node set AND their past votes stop
    * conducting, so the partition re-coarsens without them — a
    * community whose cohesion ran through a deleted doc honestly SPLITS
    * (label-prop labels move non-locally; GraphAnalyticsSpec pins a
    * split on a synthetic layout). Completes the structure family's
    * takedown symmetry: components and label-prop had del arms,
    * communities now does too. The oracle replays the refined pyramid
    * minus the ids, then the same unrolled unclamped-LPA rounds. */
  def communitiesDelQ(s: SparkSession, d: String): DataFrame = {
    val (cm, _) = delCommunityLabels(s, d)
    cm.groupBy("lbl").agg(count(lit(1)).as("comm_size"))
      .join(cm, "lbl")
      .select(col("id").as("vec_id"), col("lbl").as("community"),
        col("comm_size"))
      .orderBy("vec_id")
  }

  /** Unclamped-LPA communities over a (possibly tombstoned) at-rest
    * graph layout: live nodes only, neither direction of a deleted
    * node's edges conducts a vote — the [[labelPropOverLayout]]
    * discipline for the community face. Returns (id, lbl, comm_size). */
  def communitiesOverLayout(s: SparkSession, nodes: DataFrame,
      idxDir: String, iters: Int): DataFrame = {
    val (live, e0) = layoutLive(s, nodes, idxDir)
    val und = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val cm = communityLabelProp(live, und, iters)
    cm.groupBy("lbl").agg(count(lit(1)).as("comm_size"))
      .join(cm, "lbl")
      .select(col("id"), col("lbl"), col("comm_size"))
  }

  /** Live rows of the per-JVM TOMBSTONED fixture layout
    * ([[Retrieval.graphDelIdxDir]]): tombstone-filtered (id, label)
    * node rows and (src, dst, cos) edge rows, materialized ONCE per
    * (JVM, sfDir) into scratch parquet ([[graft.plans.Scratch]], r20).
    * The fixture is immutable after its one-time build (the tombstone
    * lands inside the [[Retrieval.graphDelIdxDir]] cache builder and
    * nothing writes there afterwards), so every `_del` arm re-running
    * the tombstone-distinct + anti-joins + 32-bucket-dir layout scan
    * per rep was pure repetition. Values unchanged — the stored rows
    * ARE the anti-joins' output. The GENERIC [[layoutLive]] below stays
    * un-memoized: specs mutate tombstones on their own layouts between
    * calls and must see fresh reads. */
  private def delLiveEmb(s: SparkSession, d: String): DataFrame =
    graft.plans.Scratch.frame(s, s"dellivenodes|$d") {
      import graft.sources.Tombstones
      Tombstones.dropDeleted(
        Tables.embeddings(s, d)
          .select(col("vec_id").cast("long").as("id"), col("label")),
        col("id"), s"${Retrieval.graphDelIdxDir(s, d)}/idx")
    }

  private def delLiveEdgesCos(s: SparkSession, d: String): DataFrame =
    graft.plans.Scratch.frame(s, s"delliveedges|$d") {
      import graft.sources.Tombstones
      val dir = s"${Retrieval.graphDelIdxDir(s, d)}/idx"
      Tombstones.dropDeleted(
        Tombstones.dropDeleted(
          s.read.parquet(s"$dir/edges")
            .select(col("__vid").as("src"), col("nbr_id").as("dst"),
              col("cos")),
          col("src"), dir),
        col("dst"), dir)
    }

  /** [[layoutLive]] over the per-JVM del fixture — the memoized (live
    * nodes, live edges) pair every `_del` named query reads. */
  private def delLayoutLive(s: SparkSession, d: String): (DataFrame, DataFrame) =
    (delLiveEmb(s, d).select("id"), delLiveEdgesCos(s, d).select("src", "dst"))

  /** (live nodes, live stored edges) of a (possibly tombstoned) at-rest
    * graph layout — the shared Tombstones discipline of every `_del`
    * query: recalled ids leave the node set and NEITHER direction of
    * their edges conducts. */
  private def layoutLive(s: SparkSession, nodes: DataFrame,
      idxDir: String): (DataFrame, DataFrame) = {
    import graft.sources.Tombstones
    val live = Tombstones.dropDeleted(
      nodes.select(col("id").cast("long").as("id")), col("id"), idxDir)
    val e0 = Tombstones.dropDeleted(
      Tombstones.dropDeleted(
        s.read.parquet(s"$idxDir/edges")
          .select(col("__vid").as("src"), col("nbr_id").as("dst")),
        col("src"), idxDir),
      col("dst"), idxDir)
    (live, e0)
  }

  /** Takedown-aware k-core — [[kcoreQ]]'s semantics over the TOMBSTONED
    * layout: a recalled doc stops corroborating its neighbors, so a
    * node whose ≥ k support ran through it honestly peels out of the
    * core (the cohesion face of a takedown, next to
    * [[componentsDelQ]]'s connectivity face and [[communitiesDelQ]]'s
    * density face). Same convergence guard as the clean query. */
  def kcoreDelQ(s: SparkSession, d: String): DataFrame = {
    val (live, e0) = delLayoutLive(s, d)
    kcoreConverged(kcorePeel(live, e0, k = CoreK, rounds = PeelRounds),
        k = CoreK, rounds = PeelRounds)
      .select(col("id").as("vec_id"), col("in_core"), col("core_deg"))
      .orderBy("vec_id")
  }

  /** Takedown-aware harmonic centrality — [[harmonicQ]] over the
    * TOMBSTONED layout: distances through a recalled doc honestly grow
    * (a ring-2 neighbor reached via the deleted bridge leaves the
    * ring), so the centrality signal stops counting reach that no
    * longer exists. */
  def harmonicDelQ(s: SparkSession, d: String): DataFrame = {
    val (live, e0) = delLayoutLive(s, d)
    harmonic3(live, e0)
      .select(col("id").as("vec_id"), col("n1"), col("n2"), col("n3"),
        col("harmonic"))
      .orderBy("vec_id")
  }

  private val CoreK = 2 // the published core order of graph_kcore
  private val PeelRounds = 4 // fixed peel count (converged at test SFs)

  /** [[CoreK]]-core membership after [[PeelRounds]] peel rounds:
    * (vec_id, in_core, core_deg). The cohesion partition of the corpus
    * graph — peripheral docs (degree-1 chains, leaf attachments) peel
    * off, the mutually-embedded core survives; curation reads the core
    * as the "well-supported" slice (every member has ≥ k surviving
    * neighbors to corroborate its graph signals) and the periphery as
    * the slice whose kNN evidence is thin.
    *
    * The "relation IS the 2-core" claim is GUARDED in-plan, not just
    * spec-pinned at the test SFs: round [[PeelRounds]]+1 peels nothing
    * iff every survivor's within-core degree is already ≥ k, which is
    * exactly a predicate on the OUTPUT columns (a survivor with
    * core_deg null or < k would peel next round) — so the convergence
    * assert costs zero extra joins, and a bigger corpus whose peel
    * cascade outruns the fixed rounds fails LOUDLY instead of serving
    * an under-peeled set as the core. */
  def kcoreQ(s: SparkSession, d: String): DataFrame =
    kcoreConverged(
        kcorePeel(Tables.embeddings(s, d).select(col("vec_id").as("id")),
          knnEdges(s, d), k = CoreK, rounds = PeelRounds),
        k = CoreK, rounds = PeelRounds)
      .select(col("id").as("vec_id"), col("in_core"), col("core_deg"))
      .orderBy("vec_id")

  /** [[kcoreQ]] over the PRODUCTION graph — the core/periphery
    * partition refreshed from the stored (src, dst) rows alone, no
    * blocked-kNN build per reading (its del twin already read the
    * layout; this closes the clean serving face). Same convergence
    * guard. */
  def kcoreRefinedQ(s: SparkSession, d: String): DataFrame =
    kcoreConverged(
        kcorePeel(Tables.embeddings(s, d).select(col("vec_id").as("id")),
          storedEdges(s, d), k = CoreK, rounds = PeelRounds),
        k = CoreK, rounds = PeelRounds)
      .select(col("id").as("vec_id"), col("in_core"), col("core_deg"))
      .orderBy("vec_id")

  /** In-plan convergence guard for a [[kcorePeel]] relation: one more
    * round peels nothing iff every survivor's within-core degree is
    * already ≥ k — a predicate on the OUTPUT columns, so the assert
    * costs zero extra joins. Identity on a converged relation; an
    * under-peeled one fails loudly at execution instead of serving a
    * non-core as the core. */
  private[operators] def kcoreConverged(peeled: DataFrame, k: Int,
      rounds: Int): DataFrame =
    peeled.filter(assert_true(
      !col("in_core") || coalesce(col("core_deg"), lit(0L)) >= k,
      lit(s"kcore: peel not converged after $rounds rounds (a survivor " +
        "still has within-core degree < k); raise the round count for " +
        "this corpus")).isNull)

  /** Takedown blast radius: every doc within 2 undirected hops of a
    * recalled id on the PRODUCTION graph layout ([[Retrieval.graphIdxDir]]
    * — the same stored edge list `graph_pagerank_refined` serves), with
    * its hop distance. This is the takedown job's re-check working set,
    * scoped BEFORE tombstoning: hop-1 docs hold neighbor lists that
    * cite the recalled doc (their stored rows need repair candidates),
    * hop-2 docs are where those repair candidates come from (the
    * NN-of-NN pool NN-Descent draws from). Two |E|-bounded joins from a
    * 3-row broadcast seed — never a corpus scan — and integer end to
    * end. */
  def blastRadiusQ(s: SparkSession, d: String): DataFrame = {
    val e0 = s.read.parquet(s"${Retrieval.graphIdxDir(s, d)}/idx/edges")
      .select(col("__vid").as("src"), col("nbr_id").as("dst"))
    import s.implicits._
    // hop 0 is the recalled ids RESTRICTED to the corpus (the oracle's
    // b0 over embeddings): a recall-list id absent from the corpus is
    // not a document to re-check, and emitting it unconditionally would
    // silently diverge from the replay. Semi-join keeps the seed ≤
    // |recall list| rows — still a broadcast.
    val h0 = Retrieval.GraphDeletedIds.toDF("id")
      .join(Tables.embeddings(s, d).select(col("vec_id").as("id")),
        Seq("id"), "left_semi")
    blastRadiusOf(e0, h0)
      .select(col("id").as("vec_id"), col("hops"))
      .orderBy("vec_id")
  }

  /** [[blastRadiusQ]]'s core over any (src, dst) edge list and seed set
    * `h0` = (id): (id, hops) for every node within 2 undirected hops of
    * a seed (the undirected closure is taken here). Two |E|-bounded
    * joins from a broadcast seed — never a corpus scan. */
  def blastRadiusOf(edges: DataFrame, h0: DataFrame): DataFrame = {
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val und = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val h1 = und.join(broadcast(h0.select(col("id").as("src"))), "src")
      .select(col("dst").as("id")).distinct()
    val h2 = und.join(broadcast(h1.select(col("id").as("src"))), "src")
      .select(col("dst").as("id"))
    h0.select(col("id"), lit(0).as("__h"))
      .unionByName(h1.select(col("id"), lit(1).as("__h")))
      .unionByName(h2.select(col("id"), lit(2).as("__h")))
      .groupBy("id").agg(min("__h").as("hops"))
  }

  /** The cohesion/reach half of the per-doc serving row
    * ([[Retrieval.graphStatsDirFor]]'s r19 widening): k-core membership
    * (the published [[CoreK]]/[[PeelRounds]] peel, convergence-guarded),
    * Watts-Strogatz local clustering, and the KMV harmonic-reach
    * estimate, all over the SAME live (nodes, edges) the store's
    * pr/community half reads — one refresh derives every dial a
    * curation reviewer wants in one point lookup. Per-node semantics
    * for edge-less nodes follow the named queries they mirror: deg and
    * n_triangles read an honest 0 (no edges, no wedges), local_coeff is
    * null (undefined below deg 2 — `graph_clustering_local` emits no
    * row at all), and the sketch still speaks (reach = self only). */
  private[operators] def statsSignals(nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    val ids = nodes.select(col("id").cast("long").as("id"))
    val kc = kcoreConverged(
        kcorePeel(ids, edges, k = CoreK, rounds = PeelRounds),
        k = CoreK, rounds = PeelRounds)
      .select(col("id"), col("in_core"), col("core_deg"))
    val lc = localClusteringOf(edges)
      .select(col("v").as("id"), col("deg"), col("n_triangles"),
        col("local_coeff"))
    val hs = harmonicSketch(ids, edges, k = SketchK)
      .select(col("id"), col("harmonic_est"))
    ids.join(kc, Seq("id"), "left")
      .join(lc, Seq("id"), "left")
      .join(hs, Seq("id"), "left")
      .select(col("id"), col("in_core"), col("core_deg"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        col("local_coeff"), col("harmonic_est"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pageRankQ,
    "graph_pagerank_w" -> pageRankWQ,
    "graph_pagerank_refined" -> pageRankRefinedQ,
    "graph_pagerank_w_refined" -> pageRankWRefinedQ,
    "graph_pagerank_del" -> pageRankDelQ,
    "graph_pagerank_append" -> pageRankAppendQ,
    "graph_ppr" -> pprQ,
    "graph_ppr_refined" -> pprRefinedQ,
    "graph_ppr_del" -> pprDelQ,
    "graph_ppr_expand" -> pprExpandQ,
    "graph_label_prop" -> labelPropQ,
    "graph_label_prop_refined" -> labelPropRefinedQ,
    "graph_label_prop_w" -> labelPropWQ,
    "graph_label_prop_w_refined" -> labelPropWRefinedQ,
    "graph_label_prop_w_del" -> labelPropWDelQ,
    "graph_label_prop_del" -> labelPropDelQ,
    "graph_label_prop_acc" -> labelPropAccQ,
    "graph_quality_prop" -> qualityPropQ,
    "graph_quality_prop_acc" -> qualityPropAccQ,
    "graph_density" -> densityQ,
    "graph_density_refined" -> densityRefinedQ,
    "graph_density_del" -> densityDelQ,
    "graph_clustering" -> clusteringQ,
    "graph_clustering_refined" -> clusteringRefinedQ,
    "graph_clustering_del" -> clusteringDelQ,
    "graph_clustering_local" -> clusteringLocalQ,
    "graph_clustering_local_refined" -> clusteringLocalRefinedQ,
    "graph_clustering_local_del" -> clusteringLocalDelQ,
    "graph_components" -> componentsQ,
    "graph_components_refined" -> componentsRefinedQ,
    "graph_components_hist" -> componentsHistQ,
    "graph_components_del" -> componentsDelQ,
    "graph_components_append" -> componentsAppendQ,
    "graph_kcore_append" -> kcoreAppendQ,
    "graph_harmonic_append" -> harmonicAppendQ,
    "graph_communities_append" -> communitiesAppendQ,
    "graph_kcore" -> kcoreQ,
    "graph_kcore_refined" -> kcoreRefinedQ,
    "graph_kcore_del" -> kcoreDelQ,
    "graph_harmonic" -> harmonicQ,
    "graph_harmonic_refined" -> harmonicRefinedQ,
    "graph_harmonic_del" -> harmonicDelQ,
    "graph_harmonic_sketch" -> harmonicSketchQ,
    "graph_harmonic_sketch_refined" -> harmonicSketchRefinedQ,
    "graph_harmonic_sketch_del" -> harmonicSketchDelQ,
    "graph_assortativity" -> assortativityQ,
    "graph_assortativity_refined" -> assortativityRefinedQ,
    "graph_assortativity_del" -> assortativityDelQ,
    "graph_communities" -> communitiesQ,
    "graph_communities_refined" -> communitiesRefinedQ,
    "graph_communities_del" -> communitiesDelQ,
    "graph_modularity" -> modularityQ,
    "graph_modularity_refined" -> modularityRefinedQ,
    "graph_modularity_del" -> modularityDelQ,
    "graph_blast_radius" -> blastRadiusQ,
    "graph_stats_store" -> graphStatsStoreQ,
  )

  /** The at-rest graph-stats SERVING ARTIFACT as a relation — the exact
    * (vec_id, pr, community, comm_size, in_core, core_deg, deg,
    * n_triangles, local_coeff, harmonic_est) rows `Retrieval.run` mode
    * "centrality" point-reads, read back whole so the store itself is
    * hash-checked (not just spec-pinned): pr must equal the refined
    * centrality replay, community/size the refined detection replay,
    * and the r19-widened cohesion/reach columns the refined kcore /
    * local-clustering / harmonic-sketch replays, because the store IS
    * those derivations materialized once. */
  def graphStatsStoreQ(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${Retrieval.graphStatsDir(s, d)}/stats")
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pr"),
        col("community"), col("comm_size"), col("in_core"), col("core_deg"),
        col("deg"), col("n_triangles"), col("local_coeff"),
        col("harmonic_est"))
      .orderBy("vec_id")

  // ------------------------------ oracles ------------------------- //

  /** `graph_pagerank_refined`'s full oracle text — also the pr half of
    * the `graph_stats_store` artifact check. */
  private lazy val pageRankRefinedSql: String =
    s"""${prLoopSql(
      """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn)""", refinedEdgeCtes)}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters ORDER BY vec_id"""

  /** `graph_communities_refined`'s full oracle text — the community
    * half of the `graph_stats_store` artifact check. */
  private lazy val communitiesRefinedSql: String =
    s"""WITH ${communityCtesOn(
         "SELECT vec_id AS id FROM embeddings", refinedEdgeCtes)},
       csize AS (SELECT lbl, count(*) AS comm_size FROM cm$Iters GROUP BY lbl)
       SELECT c.id AS vec_id, c.lbl AS community, s.comm_size
       FROM cm$Iters c JOIN csize s USING (lbl)
       ORDER BY vec_id"""

  /** `graph_kcore_refined`'s full oracle text — also the core half of
    * the widened `graph_stats_store` artifact check. (Defined as a
    * forward-referencing lazy val like its pr/community siblings; the
    * CTE builders it closes over are declared below.) */
  private lazy val kcoreRefinedSql: String =
    s"""WITH ${kcoreCtesOn(
         "SELECT vec_id AS id FROM embeddings", refinedEdgeCtes)}
       SELECT n.id AS vec_id, (k.id IS NOT NULL) AS in_core, kcd.core_deg
       FROM knodes n LEFT JOIN kc$PeelRounds k ON k.id = n.id
       LEFT JOIN kcd ON kcd.id = n.id
       ORDER BY vec_id"""

  /** `graph_clustering_local_refined`'s full oracle text — the
    * cohesion half of the widened `graph_stats_store` artifact check. */
  private lazy val clusteringLocalRefinedSql: String =
    clusteringLocalSqlOn(refinedEdgeCtes)

  /** `graph_harmonic_sketch_refined`'s full oracle text — the reach
    * half of the widened `graph_stats_store` artifact check. */
  private lazy val harmonicSketchRefinedSql: String =
    s"""WITH ${harmonicCtesOn(
         "SELECT vec_id AS id FROM embeddings", refinedEdgeCtes)},
       ${harmonicSketchSelectSql(SketchK)}"""

  /** The widened `graph_stats_store` oracle: the five refined replays
    * joined into the one per-doc serving row. ORACLE MEMORY POLICY
    * (the delEdgeCtes discipline, measured): composing the five
    * named-query texts as-is replays the NN-Descent pyramid — the
    * memory-dominant term, ~0.6-0.8 GB floor per replay under a capped
    * DuckDB — five times, and the composite needed > 2 GB. Here the
    * pyramid is hoisted ONCE into the outer WITH (subquery bodies see
    * the outer MATERIALIZED `gedges`; each body's inner WITH gets a
    * no-op `gnoop` CTE in place of its usual edge arg), which measured
    * 0.5 s vs 2.3 s and a ~1.5 GB floor vs > 2 GB for the naive
    * composition at sf0.01 under `SET memory_limit`. Per-family CTE
    * names are disjoint by construction (r·, cm·, kc·, lp, h·), so the
    * bodies cannot capture each other's state. Edge-less nodes:
    * deg/n_triangles coalesce to an honest 0, local_coeff stays null
    * (undefined below deg 2), matching [[statsSignals]]. */
  private lazy val graphStatsStoreSql: String = {
    val noop = "gnoop AS (SELECT 1 AS one)"
    val pr =
      s"""${prLoopSql(
        """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn)""", noop)}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters"""
    val cm =
      s"""WITH ${communityCtesOn(
           "SELECT vec_id AS id FROM embeddings", noop)},
       csize AS (SELECT lbl, count(*) AS comm_size FROM cm$Iters GROUP BY lbl)
       SELECT c.id AS vec_id, c.lbl AS community, s.comm_size
       FROM cm$Iters c JOIN csize s USING (lbl)"""
    val kc =
      s"""WITH ${kcoreCtesOn("SELECT vec_id AS id FROM embeddings", noop)}
       SELECT n.id AS vec_id, (k.id IS NOT NULL) AS in_core, kcd.core_deg
       FROM knodes n LEFT JOIN kc$PeelRounds k ON k.id = n.id
       LEFT JOIN kcd ON kcd.id = n.id"""
    val lc = clusteringLocalSqlOn(noop)
    val hs =
      s"""WITH ${harmonicCtesOn(
           "SELECT vec_id AS id FROM embeddings", noop)},
       ${harmonicSketchSelectSql(SketchK)}"""
    s"""WITH $refinedEdgeCtes
       SELECT p.vec_id, p.pr, c.community, c.comm_size,
         k.in_core, k.core_deg,
         coalesce(l.deg, 0) AS deg,
         coalesce(l.n_triangles, 0) AS n_triangles,
         l.local_coeff,
         h.harmonic_est
       FROM ($pr) p
       JOIN ($cm) c USING (vec_id)
       JOIN ($kc) k USING (vec_id)
       LEFT JOIN ($lc) l USING (vec_id)
       JOIN ($hs) h USING (vec_id)
       ORDER BY p.vec_id"""
  }

  /** `knn_graph`'s own oracle pyramid (assignment → blocked pairs →
    * keep-3) renamed into an edge list `ge3 (src, dst, cos)`. */
  private lazy val edgeCtesBase: String =
    s"""${Retrieval.centSql},
       gassign AS (SELECT vec_id, v, cluster FROM (
         SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
           CAST(c.label AS BIGINT) AS cluster,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c) DESC, c.label) AS rn
         FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       gpairs AS (SELECT a.vec_id, b.vec_id AS nbr_id,
           list_cosine_similarity(a.v, b.v) AS cos
         FROM gassign a JOIN gassign b
           ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
       ge3 AS (SELECT vec_id AS src, nbr_id AS dst, cos FROM (
           SELECT vec_id, nbr_id, cos,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rn
           FROM gpairs) WHERE rn <= 3)"""

  private lazy val edgeCtes: String =
    s"""$edgeCtesBase,
       gedges AS MATERIALIZED (SELECT src, dst FROM ge3)"""

  /** The same edge list with the calibrated (cos+1)/2 weight — both
    * terms exact in double, so Spark and DuckDB agree on w bit-for-bit. */
  private lazy val wEdgeCtes: String =
    s"""$edgeCtesBase,
       gedges AS MATERIALIZED (SELECT src, dst, (cos + 1) / 2 AS w FROM ge3)"""

  /** One unrolled [[prIterate]] round: dangling fold, contribution
    * folds (the SAME two-level slice-major order as
    * [[orderedSumByKeySized]], bucket count from the shared `prb`
    * sizing CTE), then the generalized teleport update
    * pr' = (1-d)·t + d·(dm·t + s) against `tvec (id, tp)`. `p` =
    * previous rank CTE name, `i` = round index. */
  private def prRoundSql(i: Int, p: String,
      weighted: Boolean = false): String = {
    val contrib = if (weighted) "r.pr * e.w / od.odeg" else "r.pr / od.odeg"
    s"""dgl$i AS (SELECT r.id, r.pr FROM $p r LEFT JOIN od ON od.src = r.id
         WHERE od.src IS NULL),
       dmb$i AS (SELECT r.id % prb.b AS bk,
           list_reduce(list(r.pr ORDER BY r.id), (acc, x) -> acc + x) AS s
         FROM dgl$i r CROSS JOIN prb GROUP BY r.id % prb.b),
       dm$i AS (SELECT coalesce((SELECT list_reduce(list(s ORDER BY bk),
           (acc, x) -> acc + x) FROM dmb$i), CAST(0 AS DOUBLE)) AS dm),
       ct$i AS (SELECT e.dst, e.src, $contrib AS c
         FROM gedges e JOIN od ON od.src = e.src JOIN $p r ON r.id = e.src),
       sb$i AS (SELECT ct.dst, ct.src % prb.b AS bk,
           list_reduce(list(ct.c ORDER BY ct.src), (acc, x) -> acc + x) AS s
         FROM ct$i ct CROSS JOIN prb GROUP BY ct.dst, ct.src % prb.b),
       ss$i AS (SELECT dst, list_reduce(list(s ORDER BY bk),
           (acc, x) -> acc + x) AS s
         FROM sb$i GROUP BY dst),
       r$i AS (SELECT t.id,
           (1 - CAST(0.85 AS DOUBLE)) * t.tp + CAST(0.85 AS DOUBLE) *
             (dm$i.dm * t.tp + coalesce(ss$i.s, CAST(0 AS DOUBLE))) AS pr
         FROM tvec t CROSS JOIN dm$i
         LEFT JOIN ss$i ON ss$i.dst = t.id)"""
  }

  /** The full unrolled loop given a `tvec (id, tp)` CTE body and an
    * edge pyramid ending in `gedges (src, dst[, w])`. `prb` replays
    * [[subBucketsFor]]'s node-count sizing (same greatest/ceil/sqrt
    * integers → same b → same slice-major fold order as Spark);
    * weighted loops replace the out-degree COUNT with the same
    * slice-major per-src weight fold the Spark side runs. */
  private def prLoopSql(tvecCte: String, edges: String = edgeCtes,
      weighted: Boolean = false): String = {
    val rounds = (1 to Iters).map(i =>
        prRoundSql(i, if (i == 1) "r0" else s"r${i - 1}", weighted))
      .mkString(",\n")
    val odCte =
      if (weighted)
        s"""odb AS (SELECT e.src, e.dst % prb.b AS bk,
           list_reduce(list(e.w ORDER BY e.dst), (acc, x) -> acc + x) AS s
         FROM gedges e CROSS JOIN prb GROUP BY e.src, e.dst % prb.b),
       od AS MATERIALIZED (SELECT src, list_reduce(list(s ORDER BY bk),
           (acc, x) -> acc + x) AS odeg FROM odb GROUP BY src)"""
      else "od AS MATERIALIZED (SELECT src, count(*) AS odeg FROM gedges GROUP BY src)"
    s"""WITH $edges,
       $tvecCte,
       prb AS (SELECT greatest(16, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)))
           AS BIGINT)) AS b FROM tvec),
       $odCte,
       r0 AS (SELECT id, tp AS pr FROM tvec),
       $rounds"""
  }

  /** The NN-Descent refined graph's edge set as `gedges` — the
    * production graph the at-rest index stores. */
  private lazy val refinedEdgeCtes: String =
    s"""${Retrieval.refinedGraphCtes},
       gedges AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst FROM gref)"""

  /** The refined edges with the calibrated weight — the stored `cos`
    * column replayed off the same pyramid. */
  private lazy val refinedWEdgeCtes: String =
    s"""${Retrieval.refinedGraphCtes},
       gedges AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst,
           (cos + 1) / 2 AS w
         FROM gref)"""

  /** The append construction replay ending in `gedges` — base-slice
    * pyramid + per-insert beam walks (the `knn_graph_append` CTEs),
    * shared by every `_append` oracle. MATERIALIZED per the oracle
    * memory policy below. */
  private lazy val appendEdgeCtes: String =
    s"""${Retrieval.appendedEdgeCtes},
       gedges AS MATERIALIZED (SELECT src, dst
         FROM ${Retrieval.appendedEdgesFinal})"""

  private lazy val delIdsSql: String =
    Retrieval.GraphDeletedIds.mkString("(", ", ", ")")

  /** The refined edges MINUS the takedown ids on either endpoint.
    *
    * ORACLE MEMORY POLICY (applies to every edge pyramid here): any
    * CTE consumed more than once by downstream SQL is declared
    * `MATERIALIZED`. DuckDB re-INLINES un-hinted multi-referenced CTEs,
    * so a consumer like `kcoreCtesOn` (references `kund` ~6×, which
    * references `gedges` 4×) expands this pyramid combinatorially —
    * `graph_kcore_del`'s oracle OOM'd at r17 exactly this way (the
    * `knn_graph_append` visited-CTE lesson, SURVEY §8). Hence `gref`
    * (the pyramid apex, [[Retrieval.refinedGraphCtesFrom]]), every
    * `gedges` wrapper, and each undirected closure (`kund`/`cund`/
    * `hund`/`lund`/`undw`/`aund`/`mu`) carry the hint; semantics are
    * unchanged, only evaluate-once is forced. */
  private lazy val delEdgeCtes: String =
    s"""${Retrieval.refinedGraphCtes},
       gedges AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst FROM gref
         WHERE vec_id NOT IN $delIdsSql AND nbr_id NOT IN $delIdsSql)"""

  private lazy val pageRankSql: String =
    s"""${prLoopSql(
      """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn)""")}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters ORDER BY vec_id"""

  /** Seed-set teleport over `label = PprSeedLabel` rows. */
  private lazy val pprLoopSql: String = prLoopSql(
    s"""ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM embeddings
         WHERE label = $PprSeedLabel),
       tvec AS (SELECT vec_id AS id,
           CASE WHEN label = $PprSeedLabel THEN CAST(1 AS DOUBLE) / ns.s
             ELSE CAST(0 AS DOUBLE) END AS tp
         FROM embeddings CROSS JOIN ns)""")

  /** One unrolled label-prop round: labeled-neighbor votes, (count
    * desc, label asc) argmax, clamped update. (`lund`, not `und` — the
    * refined-graph pyramid already owns that CTE name.) */
  private def lpRoundSql(i: Int, p: String): String =
    s"""v$i AS (SELECT u.dst, l.lbl AS vl, count(*) AS c
         FROM lund u JOIN $p l ON l.id = u.src WHERE l.lbl IS NOT NULL
         GROUP BY u.dst, l.lbl),
       c$i AS (SELECT dst AS id, vl FROM (
           SELECT dst, vl, row_number() OVER (PARTITION BY dst
             ORDER BY c DESC, vl) AS rn FROM v$i) WHERE rn = 1),
       l$i AS (SELECT n.id, coalesce(n.seed, c$i.vl, $p.lbl) AS lbl
         FROM nodes_t n LEFT JOIN c$i USING (id) LEFT JOIN $p ON $p.id = n.id)"""

  /** The full unrolled label-prop loop given a `nodes_t (id, seed)`
    * CTE body and an edge pyramid ending in `gedges (src, dst)` (the
    * undirected closure is taken here). */
  private def lpLoopSql(nodesCte: String, edges: String = edgeCtes): String = {
    val rounds = (1 to Iters).map(i => lpRoundSql(i, if (i == 1) "l0" else s"l${i - 1}"))
      .mkString(",\n")
    s"""$edges,
       lund AS MATERIALIZED (SELECT src, dst FROM gedges
         UNION SELECT dst, src FROM gedges),
       $nodesCte,
       l0 AS (SELECT id, seed AS lbl FROM nodes_t),
       $rounds"""
  }

  private lazy val labelPropCtes: String = lpLoopSql(
    s"""nodes_t AS (SELECT vec_id AS id,
           CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
         FROM embeddings)""")

  /** One unrolled WEIGHTED label-prop round: per-(node, label) vote
    * mass through the same two-level slice-major fold as the PR
    * contributions (bucket count from the `wprb` node-count sizing
    * CTE), argmax by (mass desc, label asc). */
  private def wlpRoundSql(i: Int, p: String): String =
    s"""wv$i AS (SELECT u.dst, l.lbl AS vl, u.src % wprb.b AS bk,
         list_reduce(list(u.w ORDER BY u.src), (acc, x) -> acc + x) AS s1
       FROM undw u JOIN $p l ON l.id = u.src CROSS JOIN wprb
       WHERE l.lbl IS NOT NULL
       GROUP BY u.dst, l.lbl, u.src % wprb.b),
       ws$i AS (SELECT dst, vl, list_reduce(list(s1 ORDER BY bk),
           (acc, x) -> acc + x) AS s
         FROM wv$i GROUP BY dst, vl),
       wc$i AS (SELECT dst AS id, vl FROM (
           SELECT dst, vl, row_number() OVER (PARTITION BY dst
             ORDER BY s DESC, vl) AS rn FROM ws$i) WHERE rn = 1),
       l$i AS (SELECT n.id, coalesce(n.seed, wc$i.vl, $p.lbl) AS lbl
         FROM nodes_t n LEFT JOIN wc$i USING (id) LEFT JOIN $p ON $p.id = n.id)"""

  /** The full unrolled weighted-vote loop over a pyramid ending in
    * `gwedges (src, dst, w)` and a `nodes_t (id, seed)` CTE — shared by
    * the in-plan / refined / takedown arms (the [[lpLoopSql]]
    * relationship for the weighted face). */
  private def wlpLoopSqlOn(nodesCte: String, edges: String): String = {
    val rounds = (1 to Iters).map(i => wlpRoundSql(i, if (i == 1) "l0" else s"l${i - 1}"))
      .mkString(",\n")
    s"""$edges,
       undw AS MATERIALIZED (SELECT src, dst, w FROM gwedges
         UNION SELECT dst, src, w FROM gwedges),
       $nodesCte,
       wprb AS (SELECT greatest(16, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)))
           AS BIGINT)) AS b FROM nodes_t),
       l0 AS (SELECT id, seed AS lbl FROM nodes_t),
       $rounds"""
  }

  private lazy val wlpNodesCte: String =
    s"""nodes_t AS (SELECT vec_id AS id,
           CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
         FROM embeddings)"""

  private lazy val weightedLabelPropCtes: String =
    wlpLoopSqlOn(wlpNodesCte,
      s"""$edgeCtesBase,
       gwedges AS MATERIALIZED (SELECT src, dst, cos AS w FROM ge3)""")

  /** Exact component replay: min REACHABLE id via a recursive closure
    * over the undirected edge list — deliberately independent of the
    * Spark side's pointer-jumping rounds, so the oracle checks the
    * converged SEMANTICS (components), not the algorithm. `nodesSql`
    * yields (id); `edges` is a CTE pyramid ending in `gedges (src,
    * dst)`. Ends in `ccomp (vec_id, component)` + `csz (component,
    * comp_size)`. Recursion state is (node, reachable-id) pairs —
    * bounded by Σ|component|², fine at oracle SF.
    *
    * The `WITH RECURSIVE` is scoped to an INNER derived table, NOT the
    * outer clause: under an outer `WITH RECURSIVE`, DuckDB iterates
    * EVERY cte whose body is a top-level `base UNION step` — the shared
    * edge pyramids contain such ctes (`seed`, `und`), and their
    * semantics silently change (measured: the refined pyramid emits a
    * different edge set under the outer keyword). The inner scope still
    * sees the outer ctes and keeps the recursion contained. */
  private def componentsCtes(nodesSql: String, edges: String): String =
    s"""$edges,
       cn AS ($nodesSql),
       clund AS MATERIALIZED (SELECT src, dst FROM gedges
           WHERE src IN (SELECT id FROM cn) AND dst IN (SELECT id FROM cn)
         UNION SELECT dst, src FROM gedges
           WHERE src IN (SELECT id FROM cn) AND dst IN (SELECT id FROM cn)),
       ccomp AS (
         SELECT v AS vec_id, min(m) AS component FROM (
           WITH RECURSIVE creach(v, m) AS (
             SELECT id, id FROM cn
             UNION
             SELECT r.v, e.dst FROM creach r JOIN clund e ON e.src = r.m)
           SELECT v, m FROM creach) GROUP BY v),
       csz AS (SELECT component, count(*) AS comp_size
         FROM ccomp GROUP BY component)"""

  /** The unrolled [[PeelRounds]]-round [[CoreK]]-core peel: per round a
    * degree count within the surviving set and a >= k filter — integer
    * end to end, the exact loop the Spark side runs. `nodesSql` yields
    * (id); the closure is restricted to it on both endpoints. Ends in
    * `knodes`, `kc$PeelRounds` (the survivors) and `kcd (id, core_deg)`. */
  private def kcoreCtesOn(nodesSql: String, edges: String): String = {
    val peels = (1 to PeelRounds).map { i =>
      val p = if (i == 1) "kc0" else s"kc${i - 1}"
      s"""kd$i AS (SELECT e.src AS id, count(*) AS dg FROM kund e
           JOIN $p a ON a.id = e.src JOIN $p b ON b.id = e.dst
           GROUP BY e.src),
         kc$i AS (SELECT id FROM kd$i WHERE dg >= $CoreK)"""
    }.mkString(",\n")
    s"""$edges,
       knodes AS ($nodesSql),
       kund AS MATERIALIZED (SELECT src, dst FROM gedges WHERE src <> dst
           AND src IN (SELECT id FROM knodes)
           AND dst IN (SELECT id FROM knodes)
         UNION SELECT dst, src FROM gedges WHERE src <> dst
           AND src IN (SELECT id FROM knodes)
           AND dst IN (SELECT id FROM knodes)),
       kc0 AS (SELECT id FROM knodes),
       $peels,
       kcd AS (SELECT e.src AS id, count(*) AS core_deg FROM kund e
         JOIN kc$PeelRounds a ON a.id = e.src
         JOIN kc$PeelRounds b ON b.id = e.dst
         GROUP BY e.src)"""
  }

  private lazy val kcoreCtes: String =
    kcoreCtesOn("SELECT vec_id AS id FROM embeddings", edgeCtes)

  /** The global triangle census over a `gedges (src, dst)` pyramid:
    * unordered pairs, Σ C(deg,2) wedges, the (a<b<c) two-join triangle
    * count, 3T/W — shared by the clean / refined / takedown arms. `p`
    * carries the MATERIALIZED hint (the oracle memory policy at
    * [[delEdgeCtes]]): it is consumed 6×. */
  private def clusteringSqlOn(edges: String): String =
    s"""WITH $edges,
       p AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
           greatest(src, dst) AS b
         FROM gedges WHERE src <> dst),
       deg AS (SELECT v, count(*) AS dg FROM (
           SELECT a AS v FROM p UNION ALL SELECT b FROM p) GROUP BY v),
       w AS (SELECT CAST(sum(dg * (dg - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
       t AS (SELECT count(*) AS n_triangles FROM p x
         JOIN p y ON x.b = y.a
         JOIN p z ON z.a = x.a AND z.b = y.b),
       np AS (SELECT count(*) AS n_pairs FROM p)
       SELECT np.n_pairs, w.n_wedges, t.n_triangles,
         round(3 * CAST(t.n_triangles AS DOUBLE) / w.n_wedges, 6)
           AS clustering_coeff
       FROM np CROSS JOIN w CROSS JOIN t"""

  /** Newman degree-mixing replay over a `gedges` pyramid: integer
    * degree joins + CAST-pinned sums, then the one guarded expression —
    * shared by the clean / refined / takedown arms. */
  private def assortativitySqlOn(edges: String): String =
    s"""WITH $edges,
       aund AS MATERIALIZED (SELECT src, dst FROM gedges WHERE src <> dst
         UNION SELECT dst, src FROM gedges WHERE src <> dst),
       adeg AS (SELECT src AS v, count(*) AS dg FROM aund GROUP BY src),
       ast AS (SELECT count(*) AS m,
           CAST(sum(x.dg) AS BIGINT) AS sx,
           CAST(sum(x.dg * x.dg) AS BIGINT) AS sxx,
           CAST(sum(x.dg * y.dg) AS BIGINT) AS sxy
         FROM aund e JOIN adeg x ON x.v = e.src JOIN adeg y ON y.v = e.dst)
       SELECT m, sx, sxx, sxy,
         round(CASE WHEN m * sxx <> sx * sx
           THEN CAST(m * sxy - sx * sx AS DOUBLE)
             / CAST(m * sxx - sx * sx AS DOUBLE) END, 6) AS assortativity
       FROM ast"""

  /** The per-node Watts-Strogatz replay over a `gedges` pyramid: the
    * same (a<b<c) triangle join credited to all three corners, then
    * the one division per node — shared by the clean / takedown arms. */
  private def clusteringLocalSqlOn(edges: String): String =
    s"""WITH $edges,
       lp AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
           greatest(src, dst) AS b
         FROM gedges WHERE src <> dst),
       ldeg AS (SELECT v, count(*) AS deg FROM (
           SELECT a AS v FROM lp UNION ALL SELECT b FROM lp) GROUP BY v),
       ltri AS (SELECT x.a AS v1, x.b AS v2, y.b AS v3 FROM lp x
         JOIN lp y ON x.b = y.a
         JOIN lp z ON z.a = x.a AND z.b = y.b),
       lper AS (SELECT v, count(*) AS t FROM (
           SELECT v1 AS v FROM ltri UNION ALL SELECT v2 FROM ltri
           UNION ALL SELECT v3 FROM ltri) GROUP BY v)
       SELECT d.v AS vec_id, d.deg,
         coalesce(p.t, 0) AS n_triangles,
         CASE WHEN d.deg >= 2 THEN round(
           2.0 * coalesce(p.t, 0) / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6)
         END AS local_coeff
       FROM ldeg d LEFT JOIN lper p ON p.v = d.v
       ORDER BY vec_id"""

  /** The unrolled unclamped-LPA rounds: identity labels, per-round
    * (count desc, label asc) argmax, keep-own on no votes. Ends in
    * `cm$Iters (id, lbl)` over `cund` (the undirected closure of the
    * `gedges` pyramid restricted to `nodesSql`'s (id) rows). */
  private def communityCtesOn(nodesSql: String, edges: String): String = {
    val rounds = (1 to Iters).map { i =>
      val p = if (i == 1) "cm0" else s"cm${i - 1}"
      s"""cv$i AS (SELECT u.dst, l.lbl AS vl, count(*) AS c
           FROM cund u JOIN $p l ON l.id = u.src GROUP BY u.dst, l.lbl),
         cc$i AS (SELECT dst AS id, vl FROM (
             SELECT dst, vl, row_number() OVER (PARTITION BY dst
               ORDER BY c DESC, vl) AS rn FROM cv$i) WHERE rn = 1),
         cm$i AS (SELECT p.id, coalesce(cc$i.vl, p.lbl) AS lbl
           FROM $p p LEFT JOIN cc$i USING (id))"""
    }.mkString(",\n")
    s"""$edges,
       cnodes AS ($nodesSql),
       cund AS MATERIALIZED (SELECT src, dst FROM gedges
           WHERE src IN (SELECT id FROM cnodes)
             AND dst IN (SELECT id FROM cnodes)
         UNION SELECT dst, src FROM gedges
           WHERE src IN (SELECT id FROM cnodes)
             AND dst IN (SELECT id FROM cnodes)),
       cm0 AS (SELECT id, id AS lbl FROM cnodes),
       $rounds"""
  }

  private lazy val communityCtes: String =
    communityCtesOn("SELECT vec_id AS id FROM embeddings", edgeCtes)

  /** Three unrolled cumulative-reach expansions over the undirected
    * closure restricted to `nodesSql`'s (id) rows — ends in `hnodes`,
    * `hr1..hr3` (the reach sets) and `hs1..hs3` (their sizes). Shared
    * by the exact, sketch, and takedown harmonic oracles. */
  private def harmonicCtesOn(nodesSql: String, edges: String): String =
    s"""$edges,
       hnodes AS ($nodesSql),
       hund AS MATERIALIZED (SELECT src, dst FROM gedges
           WHERE src IN (SELECT id FROM hnodes)
             AND dst IN (SELECT id FROM hnodes)
         UNION SELECT dst, src FROM gedges
           WHERE src IN (SELECT id FROM hnodes)
             AND dst IN (SELECT id FROM hnodes)),
       hr0 AS (SELECT id, id AS m FROM hnodes),
       hr1 AS (SELECT id, m FROM hr0
         UNION SELECT r.id, e.dst FROM hr0 r JOIN hund e ON e.src = r.m),
       hr2 AS (SELECT id, m FROM hr1
         UNION SELECT r.id, e.dst FROM hr1 r JOIN hund e ON e.src = r.m),
       hr3 AS (SELECT id, m FROM hr2
         UNION SELECT r.id, e.dst FROM hr2 r JOIN hund e ON e.src = r.m),
       hs1 AS (SELECT id, count(*) AS s1 FROM hr1 GROUP BY id),
       hs2 AS (SELECT id, count(*) AS s2 FROM hr2 GROUP BY id),
       hs3 AS (SELECT id, count(*) AS s3 FROM hr3 GROUP BY id)"""

  /** The exact three-ring harmonic read off `hs1..hs3`. */
  private val harmonicSelectSql: String =
    s"""SELECT id AS vec_id, s1 - 1 AS n1, s2 - s1 AS n2, s3 - s2 AS n3,
           round((s1 - 1) + (s2 - s1) / 2.0 + (s3 - s2) / 3.0, 6)
             AS harmonic
         FROM hs1 JOIN hs2 USING (id) JOIN hs3 USING (id)
         ORDER BY vec_id"""

  /** The KMV-register estimates off the same reach sets: bottom-k
    * distinct md5-uniform hashes per (node, hop), then exact-below-k /
    * (k−1)/u_k — [[harmonicSketch]]'s published estimator. */
  private def harmonicSketchSelectSql(k: Int): String = {
    val hexU = Curation.hexUSql
    val per = (1 to 3).map { h =>
      s"""hu$h AS (SELECT DISTINCT id,
             (CAST($hexU AS DOUBLE) + 0.5) / 4294967296.0 AS u
           FROM (SELECT id, substr(md5(CAST(m AS VARCHAR)), 1, 8) AS h
                 FROM hr$h)),
         hk$h AS (SELECT id, count(*) AS m, max(u) AS uk FROM (
             SELECT id, u, row_number() OVER (PARTITION BY id
               ORDER BY u) AS rn FROM hu$h) WHERE rn <= $k GROUP BY id),
         he$h AS (SELECT id, CASE WHEN m < $k THEN CAST(m AS DOUBLE)
             ELSE ${k - 1}.0 / uk END AS est FROM hk$h)"""
    }.mkString(",\n")
    s"""$per
         SELECT e1.id AS vec_id,
           round(e1.est - 1.0, 6) AS n1_est,
           round(e2.est - e1.est, 6) AS n2_est,
           round(e3.est - e2.est, 6) AS n3_est,
           round((e1.est - 1.0) + (e2.est - e1.est) / 2.0
             + (e3.est - e2.est) / 3.0, 6) AS harmonic_est
         FROM he1 e1 JOIN he2 e2 USING (id) JOIN he3 e3 USING (id)
         ORDER BY vec_id"""
  }

  def oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> pageRankSql,
    // weighted replay: the same pyramid with the calibrated weight
    // column, the out-degree COUNT replaced by the per-src weight fold,
    // and pr·w/W contributions — everything else identical
    "graph_pagerank_w" ->
      s"""${prLoopSql(
        """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn)""", wEdgeCtes, weighted = true)}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters ORDER BY vec_id""",
    // the refined-graph pyramid replays (as knn_graph_refined), then the
    // SAME unrolled loop over its edge list — the at-rest read is
    // bit-identical to the in-plan derivation (IvfLayoutSpec)
    "graph_pagerank_refined" -> pageRankRefinedSql,
    // the refined pyramid's cos column replayed as the stored weight,
    // then the weighted loop — the at-rest twin of graph_pagerank_w
    "graph_pagerank_w_refined" ->
      s"""${prLoopSql(
        """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn)""", refinedWEdgeCtes, weighted = true)}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters ORDER BY vec_id""",
    // incremental maintenance: the append construction replay (base
    // pyramid + per-insert beam walks), then the SAME unrolled loop
    // over the appended edge state — new nodes ranked, no rebuild
    "graph_pagerank_append" ->
      s"""${prLoopSql(
        """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn)""", appendEdgeCtes)}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters ORDER BY vec_id""",
    // takedown replay: the same pyramid + loop over the LIVE slice only
    "graph_pagerank_del" ->
      s"""${prLoopSql(
        s"""nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings
         WHERE vec_id NOT IN $delIdsSql),
       tvec AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) / nn.n AS tp
         FROM embeddings CROSS JOIN nn
         WHERE vec_id NOT IN $delIdsSql)""", delEdgeCtes)}
       SELECT id AS vec_id, round(pr, 9) AS pr FROM r$Iters ORDER BY vec_id""",
    // the refined-graph pyramid replays (as graph_pagerank_refined),
    // then the SAME unrolled teleport loop over its edge list — the
    // stored-edge PPR is bit-identical to an in-plan derivation over
    // the refined graph
    "graph_ppr_refined" ->
      s"""${prLoopSql(
        s"""ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM embeddings
         WHERE label = $PprSeedLabel),
       tvec AS (SELECT vec_id AS id,
           CASE WHEN label = $PprSeedLabel THEN CAST(1 AS DOUBLE) / ns.s
             ELSE CAST(0 AS DOUBLE) END AS tp
         FROM embeddings CROSS JOIN ns)""", refinedEdgeCtes)}
         SELECT t.id AS vec_id, (e.label = $PprSeedLabel) AS is_seed,
           round(r.pr, 9) AS ppr
         FROM r$Iters r JOIN tvec t ON t.id = r.id
         JOIN embeddings e ON e.vec_id = r.id
         ORDER BY vec_id""",
    // takedown replay: live nodes, live seeds (the teleport normalizer
    // is the SURVIVING trusted-set size), the refined pyramid minus the
    // recalled ids — a contaminated doc recalled from the curated
    // sample stops pulling its neighborhood into the training slice
    "graph_ppr_del" ->
      s"""${prLoopSql(
        s"""ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM embeddings
         WHERE label = $PprSeedLabel AND vec_id NOT IN $delIdsSql),
       tvec AS (SELECT vec_id AS id,
           CASE WHEN label = $PprSeedLabel THEN CAST(1 AS DOUBLE) / ns.s
             ELSE CAST(0 AS DOUBLE) END AS tp
         FROM embeddings CROSS JOIN ns
         WHERE vec_id NOT IN $delIdsSql)""", delEdgeCtes)}
         SELECT t.id AS vec_id, (e.label = $PprSeedLabel) AS is_seed,
           round(r.pr, 9) AS ppr
         FROM r$Iters r JOIN tvec t ON t.id = r.id
         JOIN embeddings e ON e.vec_id = r.id
         ORDER BY vec_id""",
    "graph_ppr" ->
      s"""$pprLoopSql
         SELECT t.id AS vec_id, (e.label = $PprSeedLabel) AS is_seed,
           round(r.pr, 9) AS ppr
         FROM r$Iters r JOIN tvec t ON t.id = r.id
         JOIN embeddings e ON e.vec_id = r.id
         ORDER BY vec_id""",
    "graph_ppr_expand" ->
      s"""$pprLoopSql
         SELECT vec_id, round(pr, 9) AS ppr FROM (
           SELECT r.id AS vec_id, r.pr
           FROM r$Iters r JOIN embeddings e ON e.vec_id = r.id
           WHERE e.label <> $PprSeedLabel
           ORDER BY r.pr DESC, r.id LIMIT 20)
         ORDER BY ppr DESC, vec_id""",
    "graph_label_prop" ->
      s"""WITH $labelPropCtes
         SELECT id AS vec_id, lbl AS label, (id % $SeedMod = 0) AS is_seed
         FROM l$Iters ORDER BY vec_id""",
    // the same vote rounds over the stored production edges
    "graph_label_prop_refined" ->
      s"""WITH ${lpLoopSql(
        s"""nodes_t AS (SELECT vec_id AS id,
           CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
         FROM embeddings)""", refinedEdgeCtes)}
         SELECT id AS vec_id, lbl AS label, (id % $SeedMod = 0) AS is_seed
         FROM l$Iters ORDER BY vec_id""",
    "graph_label_prop_w" ->
      s"""WITH $weightedLabelPropCtes
         SELECT id AS vec_id, lbl AS label, (id % $SeedMod = 0) AS is_seed
         FROM l$Iters ORDER BY vec_id""",
    // the same weighted rounds with votes through the STORED cos column
    "graph_label_prop_w_refined" ->
      s"""WITH ${wlpLoopSqlOn(wlpNodesCte,
        s"""${Retrieval.refinedGraphCtes},
       gwedges AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst,
           cos AS w
         FROM gref)""")}
         SELECT id AS vec_id, lbl AS label, (id % $SeedMod = 0) AS is_seed
         FROM l$Iters ORDER BY vec_id""",
    // takedown replay: a recalled seed's weighted votes stop conducting
    "graph_label_prop_w_del" ->
      s"""WITH ${wlpLoopSqlOn(
        s"""nodes_t AS (SELECT vec_id AS id,
           CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
         FROM embeddings WHERE vec_id NOT IN $delIdsSql)""",
        s"""${Retrieval.refinedGraphCtes},
       gwedges AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst,
           cos AS w
         FROM gref
         WHERE vec_id NOT IN $delIdsSql AND nbr_id NOT IN $delIdsSql)""")}
         SELECT id AS vec_id, lbl AS label, (id % $SeedMod = 0) AS is_seed
         FROM l$Iters ORDER BY vec_id""",
    // takedown replay: the refined pyramid MINUS the recalled ids (both
    // endpoints), live nodes only, then the same unrolled vote rounds —
    // a deleted seed's past votes must not conduct
    "graph_label_prop_del" ->
      s"""WITH ${lpLoopSql(
        s"""nodes_t AS (SELECT vec_id AS id,
             CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
           FROM embeddings WHERE vec_id NOT IN $delIdsSql)""", delEdgeCtes)}
         SELECT id AS vec_id, lbl AS label, (id % $SeedMod = 0) AS is_seed
         FROM l$Iters ORDER BY vec_id""",
    "graph_density" ->
      s"""WITH $edgeCtes,
         dd AS (SELECT src, count(*) AS degree,
             list_reduce(list(cos ORDER BY dst), (acc, x) -> acc + x) AS s
           FROM ge3 GROUP BY src)
         SELECT src AS vec_id, degree, round(s / degree, 6) AS mean_cos
         FROM dd ORDER BY vec_id""",
    "graph_clustering" -> clusteringSqlOn(edgeCtes),
    // the census refreshed off the stored production edges
    "graph_clustering_refined" -> clusteringSqlOn(refinedEdgeCtes),
    // takedown replay: the refined pyramid MINUS the recalled ids —
    // every wedge and triangle through them leaves the census
    "graph_clustering_del" -> clusteringSqlOn(delEdgeCtes),
    // the same (a<b<c) triangle join credited to all three corners,
    // then the one Watts-Strogatz division per node
    "graph_clustering_local" -> clusteringLocalSqlOn(edgeCtes),
    // the per-corner replay minus the recalled ids — a corner whose
    // third corner was recalled loses the triangle
    "graph_clustering_local_del" -> clusteringLocalSqlOn(delEdgeCtes),
    // the per-corner replay over the stored production edges — the
    // cohesion dial the widened stats store serves per doc
    "graph_clustering_local_refined" -> clusteringLocalRefinedSql,
    // components: the recursive min-reach closure (exact converged
    // semantics, not a round replay) over the same edge pyramid
    "graph_components" ->
      s"""WITH ${componentsCtes(
           "SELECT vec_id AS id FROM embeddings", edgeCtes)}
         SELECT c.vec_id, c.component, s.comp_size
         FROM ccomp c JOIN csz s USING (component)
         ORDER BY vec_id""",
    // the same recursive min-reach closure over the stored edges
    "graph_components_refined" ->
      s"""WITH ${componentsCtes(
           "SELECT vec_id AS id FROM embeddings", refinedEdgeCtes)}
         SELECT c.vec_id, c.component, s.comp_size
         FROM ccomp c JOIN csz s USING (component)
         ORDER BY vec_id""",
    "graph_components_hist" ->
      s"""WITH ${componentsCtes(
           "SELECT vec_id AS id FROM embeddings", edgeCtes)}
         SELECT comp_size, count(*) AS n_components
         FROM csz GROUP BY comp_size ORDER BY comp_size""",
    // takedown replay: the refined pyramid MINUS the recalled ids (both
    // endpoints), live nodes only — a component whose bridge was a
    // deleted doc splits
    "graph_components_del" ->
      s"""WITH ${componentsCtes(
           s"SELECT vec_id AS id FROM embeddings WHERE vec_id NOT IN $delIdsSql",
           delEdgeCtes)}
         SELECT c.vec_id, c.component, s.comp_size
         FROM ccomp c JOIN csz s USING (component)
         ORDER BY vec_id""",
    // incremental maintenance: the append construction replay (as
    // graph_pagerank_append), then the recursive min-reach closure over
    // the appended edge state — inserted nodes join (or merge)
    // components through their insert-time links, no rebuild
    "graph_components_append" ->
      s"""WITH ${componentsCtes(
           "SELECT vec_id AS id FROM embeddings", appendEdgeCtes)}
         SELECT c.vec_id, c.component, s.comp_size
         FROM ccomp c JOIN csz s USING (component)
         ORDER BY vec_id""",
    // the same unrolled peel over the appended edge state — an insert
    // joins the core iff its links give it >= k within-core support
    "graph_kcore_append" ->
      s"""WITH ${kcoreCtesOn(
           "SELECT vec_id AS id FROM embeddings", appendEdgeCtes)}
         SELECT n.id AS vec_id, (k.id IS NOT NULL) AS in_core, kcd.core_deg
         FROM knodes n LEFT JOIN kc$PeelRounds k ON k.id = n.id
         LEFT JOIN kcd ON kcd.id = n.id
         ORDER BY vec_id""",
    // the same three expansions over the appended edge state
    "graph_harmonic_append" ->
      s"""WITH ${harmonicCtesOn(
           "SELECT vec_id AS id FROM embeddings", appendEdgeCtes)}
         $harmonicSelectSql""",
    // the same unrolled unclamped-LPA rounds over the appended state —
    // an insert adopts (or seeds) a community through its links
    "graph_communities_append" ->
      s"""WITH ${communityCtesOn(
           "SELECT vec_id AS id FROM embeddings", appendEdgeCtes)},
         csize AS (SELECT lbl, count(*) AS comm_size FROM cm$Iters GROUP BY lbl)
         SELECT c.id AS vec_id, c.lbl AS community, s.comm_size
         FROM cm$Iters c JOIN csize s USING (lbl)
         ORDER BY vec_id""",
    // three unrolled cumulative-reach expansions, then the fixed
    // three-term harmonic sum (bit-parity needs no fold discipline)
    "graph_harmonic" ->
      s"""WITH ${harmonicCtesOn(
           "SELECT vec_id AS id FROM embeddings", edgeCtes)}
         $harmonicSelectSql""",
    // the same three expansions over the stored production edges
    "graph_harmonic_refined" ->
      s"""WITH ${harmonicCtesOn(
           "SELECT vec_id AS id FROM embeddings", refinedEdgeCtes)}
         $harmonicSelectSql""",
    // takedown replay: the refined pyramid MINUS the recalled ids,
    // live nodes only — distances through a deleted doc honestly grow
    // (a ring-2 neighbor via the recalled bridge leaves the ring)
    "graph_harmonic_del" ->
      s"""WITH ${harmonicCtesOn(
           s"SELECT vec_id AS id FROM embeddings WHERE vec_id NOT IN $delIdsSql",
           delEdgeCtes)}
         $harmonicSelectSql""",
    // the sketch replay rides the SAME materialized reach sets as
    // graph_harmonic (tiny at oracle SF): per (node, hop) the bottom-k
    // distinct md5-uniform hashes of the reach members — bottom-k of a
    // union equals bottom-k of the set, so the register DuckDB takes
    // directly off R_h is exactly what Spark's hop-merged Aggregator
    // holds — then the same (k-1)/uk-or-exact estimate and the same
    // fixed-order ring arithmetic. Bit parity with ZERO tolerance: this
    // sketch is oracle-checked, not a rows-only meter.
    "graph_harmonic_sketch" ->
      s"""WITH ${harmonicCtesOn(
           "SELECT vec_id AS id FROM embeddings", edgeCtes)},
         ${harmonicSketchSelectSql(SketchK)}""",
    // the register replay off the STORED edges' reach sets — the
    // scale-safe operator serving from the at-rest artifact
    "graph_harmonic_sketch_refined" -> harmonicSketchRefinedSql,
    // the same registers minus the recalled ids: their hashes leave
    // every register they'd have seeded
    "graph_harmonic_sketch_del" ->
      s"""WITH ${harmonicCtesOn(
           s"SELECT vec_id AS id FROM embeddings WHERE vec_id NOT IN $delIdsSql",
           delEdgeCtes)},
         ${harmonicSketchSelectSql(SketchK)}""",
    // unclamped synchronous LPA, unrolled — identity labels in,
    // (count desc, label asc) argmax per round, keep-own on no votes
    "graph_communities" ->
      s"""WITH $communityCtes,
         csize AS (SELECT lbl, count(*) AS comm_size FROM cm$Iters GROUP BY lbl)
         SELECT c.id AS vec_id, c.lbl AS community, s.comm_size
         FROM cm$Iters c JOIN csize s USING (lbl)
         ORDER BY vec_id""",
    // the same unrolled rounds over the stored production edges — the
    // derivation the centrality serving store reads
    "graph_communities_refined" -> communitiesRefinedSql,
    // the serving ARTIFACT itself hash-checked: the at-rest stats store
    // (the exact rows `run` mode "centrality" point-reads) must equal
    // the FIVE refined replays joined — centrality refresh, community
    // detection, k-core peel, per-node clustering, and harmonic-sketch
    // reach over the same stored edges, one relation (graphStatsStoreSql
    // below: one shared pyramid head, five per-family subquery bodies)
    "graph_stats_store" -> graphStatsStoreSql,
    // takedown replay: the refined pyramid MINUS the recalled ids (both
    // endpoints), live nodes only, then the same unrolled unclamped-LPA
    // rounds — a community held together through a deleted doc splits
    "graph_communities_del" ->
      s"""WITH ${communityCtesOn(
           s"SELECT vec_id AS id FROM embeddings WHERE vec_id NOT IN $delIdsSql",
           delEdgeCtes)},
         csize AS (SELECT lbl, count(*) AS comm_size FROM cm$Iters GROUP BY lbl)
         SELECT c.id AS vec_id, c.lbl AS community, s.comm_size
         FROM cm$Iters c JOIN csize s USING (lbl)
         ORDER BY vec_id""",
    // the same rounds, then the exact-rational Newman form: integer
    // q_num = Σ_c (in_c·m2 − deg_c²), ONE division at the end
    "graph_modularity" ->
      s"""WITH $communityCtes,
         mu AS MATERIALIZED (SELECT e.src, a.lbl AS ca, b.lbl AS cb
           FROM cund e JOIN cm$Iters a ON a.id = e.src
           JOIN cm$Iters b ON b.id = e.dst),
         mm2 AS (SELECT count(*) AS m2 FROM mu),
         mper AS (SELECT ca, count(*) AS deg,
             CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS inn
           FROM mu GROUP BY ca)
         SELECT count(*) AS n_communities, max(mm2.m2) AS m2,
           CAST(sum(inn * mm2.m2 - deg * deg) AS BIGINT) AS q_num,
           round(CAST(sum(inn * mm2.m2 - deg * deg) AS DOUBLE)
             / CAST(max(mm2.m2) * max(mm2.m2) AS DOUBLE), 6) AS modularity
         FROM mper CROSS JOIN mm2""",
    // the layout rounds (as graph_communities_refined), then the same
    // exact-rational Newman grading over the stored closure
    "graph_modularity_refined" ->
      s"""WITH ${communityCtesOn(
           "SELECT vec_id AS id FROM embeddings", refinedEdgeCtes)},
         mu AS MATERIALIZED (SELECT e.src, a.lbl AS ca, b.lbl AS cb
           FROM cund e JOIN cm$Iters a ON a.id = e.src
           JOIN cm$Iters b ON b.id = e.dst),
         mm2 AS (SELECT count(*) AS m2 FROM mu),
         mper AS (SELECT ca, count(*) AS deg,
             CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS inn
           FROM mu GROUP BY ca)
         SELECT count(*) AS n_communities, max(mm2.m2) AS m2,
           CAST(sum(inn * mm2.m2 - deg * deg) AS BIGINT) AS q_num,
           round(CAST(sum(inn * mm2.m2 - deg * deg) AS DOUBLE)
             / CAST(max(mm2.m2) * max(mm2.m2) AS DOUBLE), 6) AS modularity
         FROM mper CROSS JOIN mm2""",
    // the takedown rounds (as graph_communities_del), then the same
    // exact-rational Newman grading over the surviving closure
    "graph_modularity_del" ->
      s"""WITH ${communityCtesOn(
           s"SELECT vec_id AS id FROM embeddings WHERE vec_id NOT IN $delIdsSql",
           delEdgeCtes)},
         mu AS MATERIALIZED (SELECT e.src, a.lbl AS ca, b.lbl AS cb
           FROM cund e JOIN cm$Iters a ON a.id = e.src
           JOIN cm$Iters b ON b.id = e.dst),
         mm2 AS (SELECT count(*) AS m2 FROM mu),
         mper AS (SELECT ca, count(*) AS deg,
             CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS inn
           FROM mu GROUP BY ca)
         SELECT count(*) AS n_communities, max(mm2.m2) AS m2,
           CAST(sum(inn * mm2.m2 - deg * deg) AS BIGINT) AS q_num,
           round(CAST(sum(inn * mm2.m2 - deg * deg) AS DOUBLE)
             / CAST(max(mm2.m2) * max(mm2.m2) AS DOUBLE), 6) AS modularity
         FROM mper CROSS JOIN mm2""",
    // the refined pyramid's per-src degree + neighbor-ordered cos mean —
    // the stored weight column serving the outlier signal
    "graph_density_refined" ->
      s"""WITH ${Retrieval.refinedGraphCtes},
         rdd AS (SELECT vec_id AS src, count(*) AS degree,
             list_reduce(list(cos ORDER BY nbr_id), (acc, x) -> acc + x) AS s
           FROM gref GROUP BY vec_id)
         SELECT src AS vec_id, degree, round(s / degree, 6) AS mean_cos
         FROM rdd ORDER BY vec_id""",
    // the same per-src fold over the refined pyramid MINUS the recalled
    // ids on either endpoint — thinner degrees where evidence was lost
    "graph_density_del" ->
      s"""WITH ${Retrieval.refinedGraphCtes},
         ddel AS (SELECT vec_id, nbr_id, cos FROM gref
           WHERE vec_id NOT IN $delIdsSql AND nbr_id NOT IN $delIdsSql),
         rdd AS (SELECT vec_id AS src, count(*) AS degree,
             list_reduce(list(cos ORDER BY nbr_id), (acc, x) -> acc + x) AS s
           FROM ddel GROUP BY vec_id)
         SELECT src AS vec_id, degree, round(s / degree, 6) AS mean_cos
         FROM rdd ORDER BY vec_id""",
    // degree joins + integer sums, then ONE fixed-order expression —
    // exact inputs, bit parity for free
    "graph_assortativity" -> assortativitySqlOn(edgeCtes),
    // the degree-mixing dial refreshed off the stored edges
    "graph_assortativity_refined" -> assortativitySqlOn(refinedEdgeCtes),
    // takedown replay: a recalled hub's stubs leave both sides of
    // every degree product
    "graph_assortativity_del" -> assortativitySqlOn(delEdgeCtes),
    "graph_kcore" ->
      s"""WITH $kcoreCtes
         SELECT n.vec_id, (k.id IS NOT NULL) AS in_core, kcd.core_deg
         FROM embeddings n LEFT JOIN kc$PeelRounds k ON k.id = n.vec_id
         LEFT JOIN kcd ON kcd.id = n.vec_id
         ORDER BY vec_id""",
    // the same unrolled peel over the stored production edges
    "graph_kcore_refined" -> kcoreRefinedSql,
    // takedown replay: the refined pyramid MINUS the recalled ids, the
    // same unrolled peel — support through a deleted doc stops counting
    "graph_kcore_del" ->
      s"""WITH ${kcoreCtesOn(
           s"SELECT vec_id AS id FROM embeddings WHERE vec_id NOT IN $delIdsSql",
           delEdgeCtes)}
         SELECT n.id AS vec_id, (k.id IS NOT NULL) AS in_core, kcd.core_deg
         FROM knodes n LEFT JOIN kc$PeelRounds k ON k.id = n.id
         LEFT JOIN kcd ON kcd.id = n.id
         ORDER BY vec_id""",
    // the refined-layout pyramid (as graph_pagerank_refined), then two
    // unrolled hop expansions from the recalled seed ids
    "graph_blast_radius" ->
      s"""WITH ${Retrieval.refinedGraphCtes},
         bund AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst FROM gref
           UNION SELECT nbr_id, vec_id FROM gref),
         b0 AS (SELECT vec_id AS id FROM embeddings
           WHERE vec_id IN $delIdsSql),
         b1 AS (SELECT DISTINCT e.dst AS id FROM bund e
           JOIN b0 ON b0.id = e.src),
         b2 AS (SELECT e.dst AS id FROM bund e JOIN b1 ON b1.id = e.src)
         SELECT id AS vec_id, min(h) AS hops FROM (
           SELECT id, 0 AS h FROM b0
           UNION ALL SELECT id, 1 AS h FROM b1
           UNION ALL SELECT id, 2 AS h FROM b2)
         GROUP BY id ORDER BY vec_id""",
    "graph_label_prop_acc" ->
      s"""WITH $labelPropCtes,
         fin AS (SELECT l.id, l.lbl, (l.id % $SeedMod = 0) AS is_seed,
             e.label AS truth
           FROM l$Iters l JOIN embeddings e ON e.vec_id = l.id)
         SELECT count(*) AS n_nodes,
           CAST(sum(CASE WHEN is_seed THEN 1 ELSE 0 END) AS BIGINT) AS n_seed,
           CAST(sum(CASE WHEN NOT is_seed AND lbl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
           CAST(sum(CASE WHEN NOT is_seed AND lbl = truth THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN NOT is_seed AND lbl = truth THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN NOT is_seed AND lbl IS NOT NULL THEN 1 ELSE 0 END), 6) AS acc
         FROM fin""",
    "graph_quality_prop" ->
      s"""${Classify.nbSql},
         ${lpLoopSql(qualityNodesCte)}
         SELECT l.id AS doc_id, l.lbl AS quality,
           (n.seed IS NOT NULL) AS is_seed
         FROM l$Iters l JOIN nodes_t n ON n.id = l.id
         ORDER BY doc_id""",
    "graph_quality_prop_acc" ->
      s"""${Classify.nbSql},
         ${lpLoopSql(qualityNodesCte)},
         fin AS (SELECT l.id, l.lbl, n.seed, a.mfx
           FROM l$Iters l JOIN nodes_t n ON n.id = l.id
           JOIN agg a ON a.doc_id = l.id)
         SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN seed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seed,
           CAST(sum(CASE WHEN seed IS NULL AND lbl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_prop,
           CAST(sum(CASE WHEN seed IS NULL AND
               lbl = (CASE WHEN mfx > 0 THEN 1 ELSE 0 END)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           round(CAST(sum(CASE WHEN seed IS NULL AND
               lbl = (CASE WHEN mfx > 0 THEN 1 ELSE 0 END)
             THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN seed IS NULL AND lbl IS NOT NULL THEN 1 ELSE 0 END), 6) AS agree_rate
         FROM fin""",
  )

  /** NB fixed-point margins per doc (the `quality_nb` agg replayed)
    * thresholded into clamped quality seeds. Consumes
    * [[Classify.nbSql]]'s CTEs (t/llr/sc). */
  private lazy val qualityNodesCte: String =
    s"""ds AS (SELECT doc_id, unnest(toks) AS term FROM t),
       agg AS (SELECT doc_id,
           CAST(sum(COALESCE(llr_fx, ufx)) + max(pfx) AS BIGINT) AS mfx
         FROM ds LEFT JOIN llr USING (term) CROSS JOIN sc GROUP BY doc_id),
       nodes_t AS (SELECT doc_id AS id,
           CASE WHEN abs(mfx) >= $QualitySeedMfx
             THEN (CASE WHEN mfx > 0 THEN 1 ELSE 0 END) END AS seed
         FROM agg)"""
}
