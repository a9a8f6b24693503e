package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Context-death eviction for the per-(session, sfDir) memoization maps
  * (the `communityLabelCache` / kNN-edge-cache discipline): those caches
  * key by SparkSession because their values are lazily-localCheckpointed
  * DataFrames bound to the session's SparkContext — but a plain
  * ConcurrentHashMap then strongly retains every session (and its
  * checkpoint blocks' metadata) for the JVM's lifetime, so a long-lived
  * JVM cycling sessions leaks stopped contexts' state. A WeakHashMap
  * cannot fix it (the cached DataFrames reference their session, so the
  * value pins the key); eviction has to ride the context's own death.
  *
  * Each cache registers ONE sweep callback at class-init; [[watch]] is
  * called at every cache insert and installs (once per context) a
  * listener whose `onApplicationEnd` — fired by `SparkContext.stop()`,
  * exactly when the checkpointed blocks die anyway — runs every sweep
  * against the stopping context. Sessions sharing one context evict
  * together, which is the right granularity: their cached frames share
  * the same block manager. */
object SessionSweep {

  private val watched = ConcurrentHashMap.newKeySet[SparkContext]()
  private val sweeps = new CopyOnWriteArrayList[SparkContext => Unit]()

  /** Register an eviction callback, run once per stopping context.
    * Callbacks must be idempotent and never throw. */
  def onContextStop(f: SparkContext => Unit): Unit = sweeps.add(f)

  /** Ensure the session's context triggers the sweeps when it stops.
    * Idempotent per context; call on every cache insert (cheap: one
    * set probe after the first). */
  def watch(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (watched.add(sc))
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          sweeps.forEach(f =>
            try f(sc) catch { case _: Throwable => () })
          watched.remove(sc)
        }
      })
  }

  /** True iff `session`'s context is `sc` — the predicate every sweep
    * uses to match cache keys against the stopping context. */
  def ownedBy(session: SparkSession, sc: SparkContext): Boolean =
    session.sparkContext eq sc
}
