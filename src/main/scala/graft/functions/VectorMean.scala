package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector mean across rows (SURVEY.md §2.4 A10) — the
  * reference computes `whole_image_features = np.mean(segment_features,
  * axis=0)` (`/root/reference/SAM/upload_segments_to_elasticsearch.py:61-68`).
  *
  * Implemented as a typed [[Aggregator]]: map-side partial aggregation for
  * free (Spark plans partial_vector_mean → shuffle(one buffer per group) →
  * final merge), so the shuffle carries one `dim`-sized buffer per group
  * per partition, not the raw vectors — the property that makes a centroid
  * over 100 TB of embeddings feasible.
  */
case class VectorMeanBuffer(sums: Array[Double], var count: Long)

object VectorMean extends Aggregator[Seq[Float], VectorMeanBuffer, Seq[Float]] {
  override def zero: VectorMeanBuffer = VectorMeanBuffer(Array.empty, 0L)

  override def reduce(b: VectorMeanBuffer, v: Seq[Float]): VectorMeanBuffer = {
    if (v == null) return b
    // Grow the buffer on ragged input (same zero-padding as merge) so the
    // result is independent of encounter order; short vectors contribute 0
    // to the tail dimensions rather than silently truncating long ones.
    val sums =
      if (b.sums.length >= v.length) b.sums
      else java.util.Arrays.copyOf(b.sums, v.length)
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    VectorMeanBuffer(sums, b.count + 1)
  }

  override def merge(a: VectorMeanBuffer, b: VectorMeanBuffer): VectorMeanBuffer = {
    if (a.count == 0) return b
    if (b.count == 0) return a
    val out = new Array[Double](math.max(a.sums.length, b.sums.length))
    var i = 0
    while (i < out.length) {
      out(i) = (if (i < a.sums.length) a.sums(i) else 0.0) +
        (if (i < b.sums.length) b.sums(i) else 0.0)
      i += 1
    }
    VectorMeanBuffer(out, a.count + b.count)
  }

  override def finish(r: VectorMeanBuffer): Seq[Float] =
    if (r.count == 0) null else r.sums.map(s => (s / r.count).toFloat).toSeq

  override def bufferEncoder: Encoder[VectorMeanBuffer] = Encoders.product[VectorMeanBuffer]
  override def outputEncoder: Encoder[Seq[Float]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Double-precision variant: same partial-aggregation shape, but the mean
  * is returned as `array<double>` — used where the centroid feeds further
  * double arithmetic (IVF probes, oracle-checked queries) and a cast to
  * float would discard the exactness the buffer already has. */
object VectorMeanDouble extends Aggregator[Seq[Float], VectorMeanBuffer, Seq[Double]] {
  override def zero: VectorMeanBuffer = VectorMean.zero
  override def reduce(b: VectorMeanBuffer, v: Seq[Float]): VectorMeanBuffer =
    VectorMean.reduce(b, v)
  override def merge(a: VectorMeanBuffer, b: VectorMeanBuffer): VectorMeanBuffer =
    VectorMean.merge(a, b)
  override def finish(r: VectorMeanBuffer): Seq[Double] =
    if (r.count == 0) null else r.sums.map(_ / r.count).toSeq
  override def bufferEncoder: Encoder[VectorMeanBuffer] = Encoders.product[VectorMeanBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object VectorAggregates {
  /** DataFrame-API aggregate column: `df.groupBy(k).agg(vectorMean($"vec"))`. */
  private lazy val vectorMeanUdaf = udaf(VectorMean)
  def vectorMean(c: Column): Column = vectorMeanUdaf(c)

  private lazy val vectorMeanDoubleUdaf = udaf(VectorMeanDouble)
  def vectorMeanDouble(c: Column): Column = vectorMeanDoubleUdaf(c)
}
