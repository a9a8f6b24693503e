package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k distinct minima as a typed [[Aggregator]] — the per-GROUP
  * face of the KMV sketch ([[graft.operators.Sketches.kmvDistinct]]).
  *
  * The whole-relation KMV rides `TakeOrderedAndProject`; a per-group
  * cardinality ("distinct tokens per source") can't, and the naive
  * spellings both die at scale: `count(DISTINCT v)` per group expands
  * and shuffles every occurrence, and a window `row_number ≤ k` sorts
  * the full stream inside each group. An Aggregator gets map-side
  * PARTIAL aggregation from Spark's planner for free: each partition
  * reduces its rows into a ≤k sorted-distinct buffer per group, and
  * only those buffers — never the occurrence stream — cross the wire
  * to be set-merged (bottom-k of a union = bottom-k of the parts'
  * bottom-ks, the same mergeability [[VectorMean]] exploits for
  * centroids). Buffer ops are O(k) array inserts — k is 256, not a
  * data-sized structure.
  *
  * Distinctness is built into the buffer (membership check before
  * insert), so duplicate values collapse WITHOUT a pre-dedup shuffle —
  * frequency cannot bias the cardinality estimate, and the result is
  * encounter-order- and partitioning-independent (set semantics). */
case class BottomKBuffer(var mins: Array[Double])

class BottomKDistinct(k: Int) extends Aggregator[Double, BottomKBuffer, Seq[Double]]
    with Serializable {
  require(k >= 2, s"BottomKDistinct: k >= 2, got $k")

  override def zero: BottomKBuffer = BottomKBuffer(Array.empty)

  override def reduce(b: BottomKBuffer, u: Double): BottomKBuffer = {
    val a = b.mins
    val pos = java.util.Arrays.binarySearch(a, u)
    if (pos >= 0) return b // already present: set semantics
    val ins = -pos - 1
    if (a.length < k) {
      val out = new Array[Double](a.length + 1)
      System.arraycopy(a, 0, out, 0, ins)
      out(ins) = u
      System.arraycopy(a, ins, out, ins + 1, a.length - ins)
      b.mins = out
    } else if (ins < k) { // beats the current k-th minimum
      val out = new Array[Double](k)
      System.arraycopy(a, 0, out, 0, ins)
      out(ins) = u
      System.arraycopy(a, ins, out, ins + 1, k - ins - 1)
      b.mins = out
    }
    b
  }

  override def merge(x: BottomKBuffer, y: BottomKBuffer): BottomKBuffer = {
    val a = x.mins; val c = y.mins
    if (a.isEmpty) return y
    if (c.isEmpty) return x
    val out = new Array[Double](math.min(k, a.length + c.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < c.length)) {
      val takeA = j >= c.length || (i < a.length && a(i) <= c(j))
      val v = if (takeA) a(i) else c(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 } // dedup ties
    }
    x.mins = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    x
  }

  override def finish(r: BottomKBuffer): Seq[Double] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(r.mins)

  override def bufferEncoder: Encoder[BottomKBuffer] = Encoders.product[BottomKBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Payload-carrying sibling of [[BottomKDistinct]]: keep the ids of the
  * k rows with the smallest (u, id) per group — the mergeable form of
  * "N deterministic example rows per group". The window spelling
  * (`row_number() OVER (PARTITION BY g ORDER BY u) <= N`) sorts every
  * group's FULL occurrence stream; this buffer reduces each partition
  * to ≤k (u, id) pairs per group before anything shuffles. Ordering is
  * total ((u, id) — id breaks 32-bit hash-prefix ties), so the sample
  * is partitioning- and encounter-order-independent. */
case class BottomKPairsBuffer(var us: Array[Double], var ids: Array[Long])

class BottomKPairs(k: Int)
    extends Aggregator[(Double, Long), BottomKPairsBuffer, Seq[Long]]
    with Serializable {
  require(k >= 1, s"BottomKPairs: k >= 1, got $k")

  override def zero: BottomKPairsBuffer =
    BottomKPairsBuffer(Array.empty, Array.empty)

  /** (u, id) lexicographic compare. */
  private def lt(u1: Double, i1: Long, u2: Double, i2: Long): Boolean =
    u1 < u2 || (u1 == u2 && i1 < i2)

  override def reduce(b: BottomKPairsBuffer, row: (Double, Long)): BottomKPairsBuffer = {
    val (u, id) = row
    val n = b.us.length
    if (n == k && !lt(u, id, b.us(k - 1), b.ids(k - 1))) return b
    // insertion position by (u, id); duplicates (same row replayed into
    // one buffer can't happen in an aggregation) need no special case
    var ins = 0
    while (ins < n && lt(b.us(ins), b.ids(ins), u, id)) ins += 1
    val m = math.min(k, n + 1)
    val us = new Array[Double](m); val ids = new Array[Long](m)
    System.arraycopy(b.us, 0, us, 0, ins)
    System.arraycopy(b.ids, 0, ids, 0, ins)
    us(ins) = u; ids(ins) = id
    val tail = m - ins - 1
    System.arraycopy(b.us, ins, us, ins + 1, tail)
    System.arraycopy(b.ids, ins, ids, ins + 1, tail)
    b.us = us; b.ids = ids
    b
  }

  override def merge(x: BottomKPairsBuffer, y: BottomKPairsBuffer): BottomKPairsBuffer = {
    if (x.us.isEmpty) return y
    if (y.us.isEmpty) return x
    val m = math.min(k, x.us.length + y.us.length)
    val us = new Array[Double](m); val ids = new Array[Long](m)
    var i = 0; var j = 0; var n = 0
    while (n < m) {
      val takeX = j >= y.us.length ||
        (i < x.us.length && lt(x.us(i), x.ids(i), y.us(j), y.ids(j)))
      if (takeX) { us(n) = x.us(i); ids(n) = x.ids(i); i += 1 }
      else { us(n) = y.us(j); ids(n) = y.ids(j); j += 1 }
      n += 1
    }
    x.us = us; x.ids = ids
    x
  }

  override def finish(r: BottomKPairsBuffer): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(r.ids)

  override def bufferEncoder: Encoder[BottomKPairsBuffer] =
    Encoders.product[BottomKPairsBuffer]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object BottomKAgg {
  /** `df.groupBy(g).agg(bottomKDistinct(k)($"u"))` → sorted ≤k distinct
    * minima per group (cache one udaf per k — they're stateless). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Column => Column]()
  def bottomKDistinct(k: Int): Column => Column =
    cache.computeIfAbsent(k, kk => { val u = udaf(new BottomKDistinct(kk)); c => u(c) })

  /** `df.groupBy(g).agg(bottomKIds(k)($"u", $"id"))` → the ids of the k
    * (u, id)-smallest rows per group, ascending. */
  private val pairCache = new java.util.concurrent.ConcurrentHashMap[Int, (Column, Column) => Column]()
  def bottomKIds(k: Int): (Column, Column) => Column =
    pairCache.computeIfAbsent(k, kk => {
      val u = udaf(new BottomKPairs(kk), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      (c1, c2) => u(c1, c2)
    })
}
