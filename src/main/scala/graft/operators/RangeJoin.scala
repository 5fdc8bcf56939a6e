package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join without an equi key.
  *
  * Spark's planner turns a bare range predicate (`r.v BETWEEN l.lo AND
  * l.hi`) into a BroadcastNestedLoopJoin or a cartesian product — both
  * O(|L|·|R|) and undistributable at scale. This operator makes the join
  * an EQUI join on a derived bucket key: the right side maps each value
  * to bucket `floor(v / W)`, the left side replicates each interval into
  * the buckets it covers, and the exact range predicate filters inside
  * the matched bucket. The shuffle is keyed by bucket — fully
  * distributed, candidate volume bounded by bucket occupancy.
  *
  * Replication factor for the left side is `(hi − lo) / W + 1`, so pick
  * `W` on the order of the typical interval width: small W → more
  * replicas but tighter buckets; large W → fewer replicas but more
  * false candidates for the filter. Both are linear knobs; neither is a
  * cross join.
  *
  * Bounds are inclusive and long-typed (caller converts
  * timestamps/dates to epoch seconds/days first — integer bucket math
  * is exact and engine-portable). Each right value lands in exactly one
  * bucket, so no post-join dedup is needed.
  */
object RangeJoin {

  /** Inner range join: rows `(l, r)` with `r(valueCol) ∈ [l(loCol), l(hiCol)]`.
    * Column names must be disjoint between the two sides.
    */
  /** Exact long floor-division: `div` truncates toward zero, so subtract
    * 1 on an inexact negative division. All-integer — `floor(c / w)`
    * goes through a double and mis-buckets magnitudes above 2^53 (e.g.
    * full-range 64-bit hash keys), silently dropping matches.
    */
  private def floorDiv(colName: String, w: Long): org.apache.spark.sql.Column =
    expr(
      s"(`$colName` div ${w}L) - (CASE WHEN `$colName` % ${w}L != 0 AND `$colName` < 0 THEN 1 ELSE 0 END)"
    )

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      valueCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn(
      "__bucket",
      explode(sequence(floorDiv(loCol, bucketWidth), floorDiv(hiCol, bucketWidth)))
    )
    val rb = right.withColumn("__bucket", floorDiv(valueCol, bucketWidth))
    lb.join(rb, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }
}
