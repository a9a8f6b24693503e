package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broadcast Bloom membership filter — the "too big to hash-map, small
  * enough to bit-set" middle regime of the semi-join size spectrum this
  * engine's decontam/dedup probes live on.
  *
  * A broadcast-hash semi-join keys an exact hash map: ~16+ bytes per
  * distinct key, so a 1e9-gram held-out set (real for a benchmark-suite
  * union at lake scale) is a ≥16 GB broadcast — undeliverable. The
  * shuffle-hash fallback ([[graft.operators.Curation.decontaminate]])
  * is correct but exchanges the ENTIRE corpus-side gram stream keyed by
  * `sh` — at 100 TB that shuffle IS the job. A Bloom filter at 1% fpp
  * costs ~1.2 bytes/key (~1.2 GB for 1e9 keys — a deliverable
  * broadcast), and prefiltering the corpus grams with it shrinks the
  * exchange to true matches + fpp·non-matches ≈ 0.1% of the stream
  * before the exact join disposes of the false positives. Sketch
  * proposes, exact disposes — the repo-wide discipline
  * ([[graft.operators.Sketches]]), applied to join sizing.
  *
  * Mechanics:
  *  - [[build]] sizes m (bits, 64-aligned) and k from the classic
  *    optima m = −n·ln(fpp)/ln²2, k = (m/n)·ln 2, then computes each
  *    key's k (word, mask) pairs IN THE SAME JVM CODE the probe uses
  *    ([[BloomBits.positions]] — no SQL re-spelling of the double-hash
  *    mix, so build and probe cannot drift on overflow semantics) and
  *    reduces them with a map-side-partial `bit_or` groupBy: the only
  *    data crossing the wire is ≤ set-words rows of (word, mask) — the
  *    bit-set itself, never the key stream.
  *  - the assembled bits go out as a TorrentBroadcast (one copy per
  *    executor, BitTorrent-style distribution — NOT a per-task plan
  *    literal, which would re-ship gigabytes with every task binary).
  *  - [[mightContain]] is a codegen'd expression whose generated code
  *    calls [[BloomContainsExpr.hit]] on the broadcast-resolved bits:
  *    k dependent loads per row, zero allocation, inside the scan's
  *    whole-stage-codegen span.
  *
  * One-sided error: `mightContain` has NO false negatives (every
  * inserted key probes the exact bits it set), so a Bloom PREfilter
  * before an exact semi-join never changes the result — only the
  * exchange volume. False positives only ever let a non-member through
  * to the exact join, which drops it.
  */
object BloomFilters {

  /** Immutable bit-set + probe schedule. `mBits` is always a multiple
    * of 64 and ≥ 64, so `pos >>> 6` indexes `bits` in range. */
  case class BloomBits(bits: Array[Long], k: Int, mBits: Long)
      extends Serializable {

    /** The j-th probe position of key-hash `h` (Kirsch–Mitzenmacher
      * double hashing over a murmur-style finalizer mix; j < k).
      * Shared verbatim by build and probe — the no-drift contract. */
    def position(h: Long, j: Int): Long = {
      val h2 = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
      java.lang.Math.floorMod(h + j.toLong * h2, mBits)
    }

    def mightContain(h: Long): Boolean = {
      var j = 0
      while (j < k) {
        val p = position(h, j)
        if ((bits((p >>> 6).toInt) & (1L << p)) == 0L) return false
        j += 1
      }
      true
    }

    /** Inserted-bit fraction — the self-grading load metric (expected
      * fpp ≈ loadFactor^k). */
    def loadFactor: Double = {
      var set = 0L
      var i = 0
      while (i < bits.length) { set += java.lang.Long.bitCount(bits(i)); i += 1 }
      set.toDouble / mBits
    }
  }

  /** Handle → broadcast bits. The expression builder resolves handles
    * at ANALYSIS time on the driver, so executors only ever see the
    * Broadcast object — the registry never leaves the driver. */
  private val registry = new ConcurrentHashMap[String, Broadcast[BloomBits]]()

  private[functions] def resolve(handle: String): Broadcast[BloomBits] = {
    val b = registry.get(handle)
    require(b != null, s"graft_bloom_contains: unknown bloom handle '$handle'" +
      " — build() it in this JVM first (handles are driver-scoped, not persisted)")
    b
  }

  /** Size, populate and broadcast a Bloom filter over the LongType
    * column `hash` of `df` (pre-hashed 8-byte keys — the decontam
    * shingle convention). `expectedN` ≤ 0 means "count the build side"
    * (one metadata-scale job next to the corpus scan it will save). */
  def build(df: DataFrame, hash: Column, fpp: Double = 0.01,
      expectedN: Long = -1L): String = {
    require(fpp > 0.0 && fpp < 1.0, s"bloom fpp in (0,1), got $fpp")
    val s = df.sparkSession
    import s.implicits._
    val keys = df.filter(hash.isNotNull).select(hash.cast("long")).as[Long]
    val n = math.max(1L, if (expectedN > 0) expectedN else keys.count())
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val mBits = math.max(64L, ((mRaw + 63L) / 64L) * 64L)
    val k = math.max(1, math.round(mBits.toDouble / n * ln2).toInt)
    val proto = BloomBits(Array.emptyLongArray, k, mBits)
    // (word, mask) pairs via the shared JVM position(); bit_or partials
    // combine map-side, so the exchange carries ≤ set-words rows
    val words = keys.flatMap { h =>
      (0 until proto.k).map { j =>
        val p = proto.position(h, j)
        (p >>> 6, 1L << p) // Java << masks the shift count to 6 bits
      }
    }.toDF("word", "mask")
      .groupBy("word").agg(expr("bit_or(mask)").as("mask"))
      .collect()
    val bits = new Array[Long]((mBits >>> 6).toInt)
    words.foreach(r => bits(r.getLong(0).toInt) |= r.getLong(1))
    val handle = java.util.UUID.randomUUID().toString
    registry.put(handle, s.sparkContext.broadcast(BloomBits(bits, k, mBits)))
    handle
  }

  /** Release a [[build]]-ed filter: drop the driver registry entry and
    * destroy the TorrentBroadcast, freeing the executor block-manager
    * copies. Without this every build leaks its bits for the JVM's
    * lifetime (registry + block manager) — a long-lived service that
    * rebuilds a benchmark filter per request would accumulate GBs.
    * Call AFTER every plan probing the handle has EXECUTED: the probe
    * expression resolves the broadcast at analysis time, but executors
    * fetch blocks lazily at task run, so destroying under a pending
    * plan fails its tasks. Unknown handles no-op (idempotent — safe in
    * finally blocks and on double-release). */
  def destroy(handle: String): Unit = {
    val b = registry.remove(handle)
    if (b != null) b.destroy()
  }

  /** Membership probe column for a previously [[build]]-ed filter. */
  def mightContain(spark: SparkSession, handle: String, hash: Column): Column = {
    register(spark)
    call_function("graft_bloom_contains", hash, lit(handle))
  }

  /** Observability row for a built filter (bits, k, load factor). */
  def describe(handle: String): (Long, Int, Double) = {
    val b = resolve(handle).value
    (b.mBits, b.k, b.loadFactor)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_contains"))) {
      reg.createOrReplaceTempFunction("graft_bloom_contains",
        es => BloomContainsExpr(es(0), resolve(
          es(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)),
        "built-in")
    }
  }
}

/** `bits.mightContain(hash)` as a codegen'd scalar — k dependent bit
  * probes per row inside the scan's whole-stage span. The broadcast
  * HANDLE is what serializes with the plan; bits land once per executor
  * via the block manager. */
case class BloomContainsExpr(child: Expression,
    bloom: Broadcast[BloomFilters.BloomBits]) extends UnaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${t.catalogString}")
  }

  /** Executor-side entry for both eval and generated code. */
  def hit(h: Long): Boolean = bloom.value.mightContain(h)

  override def nullSafeEval(v: Any): Any = hit(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomContainsExpr].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.hit($h);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
