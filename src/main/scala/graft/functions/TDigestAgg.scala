package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", the MERGING-digest variant): centroids
  * sized by the k1 scale function `k(q) = δ/(2π)·asin(2q−1)`, which
  * keeps clusters tiny near both tails (where quantile queries care)
  * and wide in the middle. New points land in an unmerged buffer and
  * are folded into the sorted centroid list on overflow — amortized
  * O(log) per point, O(δ) memory, and merge of two digests is just
  * re-clustering the union of their centroids.
  *
  * This is the engine's mergeable-sketch building block for quantiles:
  * a partial aggregate per partition, byte-serializable between map and
  * reduce side, constant-size state per group regardless of group size
  * — the shape that makes p99-at-100-TB a single keyed shuffle of
  * ~2 KB payloads instead of a sort. Rank error is O(1/δ) in the
  * middle and far smaller at the tails; δ=300 keeps the worst case
  * near 0.5 % of rank.
  */
final class TDigest(val compression: Double) extends Serializable {

  private[functions] var means: Array[Double] = Array.emptyDoubleArray
  private[functions] var weights: Array[Double] = Array.emptyDoubleArray
  private[functions] var lo: Double = Double.PositiveInfinity
  private[functions] var hi: Double = Double.NegativeInfinity

  // Unmerged buffer grows geometrically to TmpCap: a fresh buffer costs
  // ~1 KB, not 32 KB — per-group in-memory state must stay near the
  // serialized size or a high-cardinality groupBy pays 16× for nothing.
  private var tmpM = new Array[Double](TDigest.TmpInit)
  private var tmpW = new Array[Double](TDigest.TmpInit)
  private var tmpN = 0

  def add(v: Double, w: Double = 1.0): Unit = {
    // NaN never sorts or compares; folding one into a centroid mean
    // would silently poison every estimate for the group — drop it,
    // matching the null-input treatment.
    if (java.lang.Double.isNaN(v)) return
    if (tmpN == tmpM.length) {
      if (tmpM.length < TDigest.TmpCap) {
        tmpM = java.util.Arrays.copyOf(tmpM, tmpM.length * 2)
        tmpW = java.util.Arrays.copyOf(tmpW, tmpW.length * 2)
      } else compress()
    }
    tmpM(tmpN) = v
    tmpW(tmpN) = w
    tmpN += 1
    if (v < lo) lo = v
    if (v > hi) hi = v
  }

  def mergeWith(o: TDigest): Unit = {
    o.compress()
    var i = 0
    while (i < o.means.length) { add(o.means(i), o.weights(i)); i += 1 }
    // Centroid means are interior points; true extremes come from o.
    if (o.lo < lo) lo = o.lo
    if (o.hi > hi) hi = o.hi
  }

  def totalWeight: Double = { compress(); var s = 0.0; var i = 0; while (i < weights.length) { s += weights(i); i += 1 }; s }

  def centroidCount: Int = { compress(); means.length }

  private def k(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)

  /** Fold the unmerged buffer into the centroid list: sort the union by
    * mean, then greedily coalesce neighbours while the cluster stays
    * within one k-unit — the invariant that bounds rank error.
    */
  def compress(): Unit = {
    if (tmpN == 0) return
    val n = means.length + tmpN
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    System.arraycopy(means, 0, m, 0, means.length)
    System.arraycopy(weights, 0, w, 0, weights.length)
    var i = 0
    while (i < tmpN) {
      m(means.length + i) = tmpM(i)
      w(means.length + i) = tmpW(i)
      i += 1
    }
    tmpN = 0
    val idx = Array.range(0, n).sortBy(m(_))
    var total = 0.0
    i = 0
    while (i < n) { total += w(i); i += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var outN = 0
    var wBefore = 0.0
    var kLo = k(0.0)
    var cSum = m(idx(0)) * w(idx(0))
    var cW = w(idx(0))
    i = 1
    while (i < n) {
      val j = idx(i)
      val qHi = (wBefore + cW + w(j)) / total
      if (k(qHi) - kLo <= 1.0) {
        cSum += m(j) * w(j)
        cW += w(j)
      } else {
        outM(outN) = cSum / cW
        outW(outN) = cW
        outN += 1
        wBefore += cW
        kLo = k(wBefore / total)
        cSum = m(j) * w(j)
        cW = w(j)
      }
      i += 1
    }
    outM(outN) = cSum / cW
    outW(outN) = cW
    outN += 1
    means = java.util.Arrays.copyOf(outM, outN)
    weights = java.util.Arrays.copyOf(outW, outN)
  }

  /** Quantile estimate: linear interpolation between centroid midpoints,
    * pinned to the exact min/max at the extremes.
    */
  def quantile(p: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = p * total
    if (target <= weights(0) / 2.0) {
      val f = target / (weights(0) / 2.0)
      return lo + f * (means(0) - lo)
    }
    var cum = 0.0
    i = 0
    while (i < n - 1) {
      val mid = cum + weights(i) / 2.0
      val nextMid = cum + weights(i) + weights(i + 1) / 2.0
      if (target <= nextMid) {
        if (nextMid == mid) return means(i)
        val f = (target - mid) / (nextMid - mid)
        return means(i) + f * (means(i + 1) - means(i))
      }
      cum += weights(i)
      i += 1
    }
    val lastMid = cum + weights(n - 1) / 2.0
    val span = total - lastMid
    if (span <= 0.0) return hi
    val f = (target - lastMid) / span
    means(n - 1) + math.min(f, 1.0) * (hi - means(n - 1))
  }

  def serialize(): Array[Byte] = {
    compress()
    val buf = ByteBuffer.allocate(8 * 3 + 4 + 16 * means.length)
    buf.putDouble(compression)
    buf.putDouble(lo)
    buf.putDouble(hi)
    buf.putInt(means.length)
    var i = 0
    while (i < means.length) { buf.putDouble(means(i)); buf.putDouble(weights(i)); i += 1 }
    buf.array()
  }
}

object TDigest {

  /** Unmerged-buffer start size and cap: the buffer doubles from
    * TmpInit up to TmpCap, so tiny groups stay ~1 KB while big groups
    * still amortize the compress sort.
    */
  val TmpInit = 64
  val TmpCap = 2048

  val DefaultCompression = 300.0

  def deserialize(bytes: Array[Byte]): TDigest = {
    val buf = ByteBuffer.wrap(bytes)
    val d = new TDigest(buf.getDouble())
    d.lo = buf.getDouble()
    d.hi = buf.getDouble()
    val n = buf.getInt()
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { m(i) = buf.getDouble(); w(i) = buf.getDouble(); i += 1 }
    d.means = m
    d.weights = w
    d
  }
}

/** `graft_tdigest(value, compression, p1, p2, …)` — approximate
  * quantiles at the given probabilities via a mergeable [[TDigest]],
  * as a [[TypedImperativeAggregate]]: Spark runs it with partial
  * (map-side) aggregation, serializing the digest — not the data —
  * across the shuffle. Complements the exact histogram-arithmetic
  * quantiles (q46/q73, cheap when value cardinality is bounded) for
  * the unbounded-cardinality case where an exact answer would need a
  * sort: the sketch is O(compression) per group, period.
  */
case class TDigestAgg(
    child: Expression,
    probabilities: Seq[Double],
    compression: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TDigest] {

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression = copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_tdigest requires a double value, got ${child.dataType.catalogString}"
      )
    else if (probabilities.isEmpty)
      TypeCheckResult.TypeCheckFailure("graft_tdigest needs at least one probability")
    else if (probabilities.exists(p => p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure("graft_tdigest probabilities must be in [0, 1]")
    else if (compression < 20.0)
      TypeCheckResult.TypeCheckFailure("graft_tdigest compression must be >= 20")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_tdigest"

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: TDigest): Any =
    new GenericArrayData(probabilities.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): TDigest =
    TDigest.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
}
