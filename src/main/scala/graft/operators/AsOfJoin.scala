package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * `right.time <= left.time` within the same key (the time-series /
  * point-in-time-correct lookup Spark has no built-in operator for).
  *
  * Composed from existing operators (preference (a) over a custom
  * SparkPlan): tag both sides, union them on (key, time), and carry the
  * latest right values forward with an ignoreNulls `last` window —
  * a single shuffle on the key, one sort within partitions, no join
  * explosion. This is exactly the merge pattern a dedicated
  * sort-merge-as-of physical operator would perform, expressed so
  * Catalyst/AQE keep planning it (skew handling, coalescing) for free.
  *
  * Requirements: `right` must be unique per (key, time) — pre-aggregate
  * if not (ties would be order-ambiguous in ANY as-of engine). A right
  * row at exactly `left.time` matches (<= semantics, like DuckDB
  * ASOF JOIN).
  *
  * Variants (same single-shuffle composition, different sort/guard):
  *   - `direction = "forward"`: nearest right row with
  *     `right.time >= left.time` (the scheduled-future lookup) — the
  *     union is simply processed in descending time order.
  *   - `toleranceSec`: maximum allowed |gap|; a match farther away is
  *     nulled out (pandas `merge_asof(tolerance=...)` semantics).
  *
  * @param left      probe side
  * @param right     build side, unique on (key, time)
  * @param key       equi-key column name present on both sides
  * @param leftTime  event-time column on left
  * @param rightTime event-time column on right (kept in the output as
  *                  the matched as-of time; null when no match)
  * @param direction "backward" (default: latest right <= left) or
  *                  "forward" (earliest right >= left)
  * @param toleranceSec optional max gap in seconds for a valid match
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      direction: String = "backward",
      toleranceSec: Option[Long] = None
  ): DataFrame = {
    require(
      direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction"
    )
    val rightVals = right.columns.filter(c => c != key && c != rightTime)
    val leftCols = left.columns

    // Right rows sort BEFORE left rows at an equal timestamp (seq 0 < 1)
    // so <= (or >= when forward) matches; last(ignoreNulls) then carries
    // right values to every subsequent left row of the key.
    val taggedRight = right
      .withColumn("__t", col(rightTime).cast("timestamp"))
      .withColumn("__seq", lit(0))
      .withColumn("__asof_time", col(rightTime))
      .select(
        Seq(col(key), col("__t"), col("__seq"), col("__asof_time")) ++
          rightVals.map(col) ++
          leftCols.filter(c => c != key).map(c => lit(null).as(s"__l_$c")): _*
      )
    val taggedLeft = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__seq", lit(1))
      .withColumn("__asof_time", lit(null).cast(right.schema(rightTime).dataType))
      .select(
        Seq(col(key), col("__t"), col("__seq"), col("__asof_time")) ++
          rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
          leftCols.filter(c => c != key).map(c => col(c).as(s"__l_$c")): _*
      )

    val timeOrd = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window
      .partitionBy(col(key))
      .orderBy(timeOrd, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft
      .unionByName(taggedRight)
      .withColumn("__m_time", last(col("__asof_time"), ignoreNulls = true).over(w))
    val withVals = rightVals.foldLeft(carried) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(c), ignoreNulls = true).over(w))
    }

    val gapOk: org.apache.spark.sql.Column = toleranceSec match {
      case None => lit(true)
      case Some(tol) =>
        val mSec = col("__m_time").cast("timestamp").cast("long")
        val lSec = col("__t").cast("long")
        val gap = if (direction == "backward") lSec - mSec else mSec - lSec
        col("__m_time").isNotNull && gap <= tol
    }

    withVals
      .filter(col("__seq") === 1)
      .select(
        Seq(col(key)) ++
          leftCols.filter(c => c != key).map(c => col(s"__l_$c").as(c)) ++
          Seq(when(gapOk, col("__m_time")).as(s"asof_$rightTime")) ++
          rightVals.map(c => when(gapOk, col(s"__m_$c")).as(c)): _*
      )
  }
}
