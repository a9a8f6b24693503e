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

  // One FutureTask per key, registered with putIfAbsent and RUN OUTSIDE
  // the map's bin lock (r21, advice fix): several builds call
  // Scratch.frame for ANOTHER key mid-build (communityLabels →
  // knnEdgesCos in GraphAnalytics), and running builds inside
  // computeIfAbsent violates ConcurrentHashMap's no-nested-update
  // contract — a data-dependent IllegalStateException("Recursive
  // update") or deadlock whenever outer and inner keys share a hash
  // bin. It also held a bin lock across a full Spark job, stalling
  // concurrent serving threads whose unrelated keys collided.
  private val dirCache =
    new ConcurrentHashMap[String, java.util.concurrent.FutureTask[String]]()
  private val planCache = new ConcurrentHashMap[String, DataFrame]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      dirCache.values.forEach { t =>
        // only completed, successful builds own a directory
        if (t.isDone) {
          try rm(new java.io.File(t.get())) catch { case _: Throwable => () }
        }
      }
    }))
  }

  /** Scratch root: `spark.graft.scratch.dir` if set (a shared
    * filesystem on a real cluster — driver-local temp dirs are only
    * correct in local mode, where executors and driver share a disk),
    * else the JVM temp dir. */
  private def newScratchDir(s: SparkSession): java.nio.file.Path = {
    val conf = s.conf.getOption("spark.graft.scratch.dir")
    conf match {
      case Some(root) =>
        val p = java.nio.file.Paths.get(root)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.createTempDirectory(p, "graft_scratch")
      case None => java.nio.file.Files.createTempDirectory("graft_scratch")
    }
  }

  /** The frame `build` evaluates to, computed and written to scratch
    * parquet once per (JVM, `key`) — later calls (any session) read the
    * stored rows. `key` must determine the rows (the callers key by
    * derivation kind + sfDir/indexDir, and every derivation here is
    * deterministic in its inputs). The build is EAGER at first call —
    * exactly where the deferred-view contract wants it: the first query
    * that resolves the binding, never view registration. A build that
    * throws removes both its temp dir and its cache slot, so a later
    * call can retry instead of replaying the cached failure. */
  def frame(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val task = new java.util.concurrent.FutureTask[String](() => {
      val tmp = newScratchDir(s)
      try {
        build.write.mode("overwrite").parquet(s"$tmp/data")
        tmp.toString
      } catch {
        case e: Throwable =>
          def rm(f: java.io.File): Unit = {
            val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
            f.delete()
          }
          rm(tmp.toFile)
          throw e
      }
    })
    val existing = dirCache.putIfAbsent(key, task)
    val winner = if (existing == null) { task.run(); task } else existing
    val dir =
      try winner.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          dirCache.remove(key, winner) // let the next caller retry
          throw e.getCause
      }
    // Plan memo keyed by dir, revalidated against context cycling (r21,
    // advice fix): a cached DataFrame is bound to the session that first
    // read it, and after a SparkContext stop/start in the same JVM every
    // use would fail with "Cannot call methods on a stopped
    // SparkContext" — re-read through the CALLER's session instead (the
    // data dir survives; the re-read is schema inference only).
    val cached = planCache.get(dir)
    if (cached != null && !cached.sparkSession.sparkContext.isStopped) cached
    else {
      val df = s.read.parquet(s"$dir/data")
      planCache.put(dir, df)
      df
    }
  }
}
