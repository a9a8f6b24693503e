package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once parquet-backed scratch frames — the at-rest spelling of
  * the per-(JVM, sfDir) DataFrame memos.
  *
  * r19 memoized the expensive query-independent derivations (the
  * in-plan kNN edge build, the LPA label tables, the NB seed table, the
  * whole-image vector aggregate, the lexical tokenization + vocabulary)
  * as lazily-localCheckpointed DataFrames keyed per session. That held
  * the rows in the session's block manager — and r20's measurement
  * audit found the bench protocol silently breaking it: `graft.Bench`
  * unpersists every persistent RDD between reps (deliberate timing
  * hygiene for the per-query loop checkpoints), which also dropped the
  * MEMOIZED frames' blocks. A locally-checkpointed RDD has truncated
  * lineage, so every later rep that touched a memoized frame failed
  * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — swallowed by the bench's
  * per-query try/catch — and the reported "median" for ~40 rows was the
  * time-to-failure, not the computation (reproduced: graph_pagerank
  * reps read ok/FAIL/FAIL, search_mlt FAIL on every rep).
  *
  * The fix is the discipline every at-rest index family already uses:
  * materialize the derivation ONCE per (JVM, key) into a scratch
  * parquet dir and serve the re-read relation. Parquet blocks survive
  * RDD unpersists and session cycling (no SessionSweep eviction
  * needed), the scan carries real size stats (join planning keeps its
  * broadcast decisions, which lazy checkpoints' LogicalRDD lost), and
  * the rows are bit-identical — parquet stores the longs/doubles/arrays
  * these memos hold exactly. Scratch dirs are JVM-lifetime temp dirs
  * removed by a shutdown hook: nothing persists across runs, every
  * invocation still computes from the parquet inputs.
  *
  * The re-read relation is plan-memoized per dir (the
  * [[graft.Tables]] planCache pattern): parquet schema inference runs
  * once per build, not once per reference; reuse across sessions is
  * safe (LogicalRelation is a MultiInstanceRelation). */
object Scratch {

  private val dirCache = new ConcurrentHashMap[String, String]()
  private val planCache = new ConcurrentHashMap[String, DataFrame]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      dirCache.values.forEach { dir => rm(new java.io.File(dir)) }
    }))
  }

  /** The frame `build` evaluates to, computed and written to scratch
    * parquet once per (JVM, `key`) — later calls (any session) read the
    * stored rows. `key` must determine the rows (the callers key by
    * derivation kind + sfDir/indexDir, and every derivation here is
    * deterministic in its inputs). The build is EAGER at first call —
    * exactly where the deferred-view contract wants it: the first query
    * that resolves the binding, never view registration. */
  def frame(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val dir = dirCache.computeIfAbsent(key, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_scratch").toString
      build.write.mode("overwrite").parquet(s"$tmp/data")
      tmp
    })
    planCache.computeIfAbsent(dir, _ => s.read.parquet(s"$dir/data"))
  }
}
