package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-asof-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of semantics: latest right <= left time, equal-ts matches, no-match nulls") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // between r1 and r2 → r1
      (2L, "a", ts("2024-01-01 12:00:00")), // exactly r2 → r2 (<= semantics)
      (3L, "a", ts("2024-01-01 08:00:00")), // before all right rows → null
      (4L, "b", ts("2024-01-01 10:00:00")), // key with no right rows → null
      (5L, "a", ts("2024-01-02 00:00:00")) // after all → r2
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      ("a", ts("2024-01-01 09:00:00"), 100.0), // r1
      ("a", ts("2024-01-01 12:00:00"), 200.0) // r2
    ).toDF("key", "rts", "price")

    val out = AsOfJoin
      .asofJoin(left, right, "key", "ts", "rts")
      .collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[java.lang.Double]("price")))
      .toMap

    assert(out(1L).contains(100.0))
    assert(out(2L).contains(200.0), "right row at exactly left ts matches")
    assert(out(3L).isEmpty, "left row before all right rows gets null")
    assert(out(4L).isEmpty, "key absent from right gets null")
    assert(out(5L).contains(200.0))
    assert(out.size == 5, "every left row survives (left-join semantics)")
  }

  test("forward direction: earliest right >= left time") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // before r1 → r1 (nearest future)
      (2L, "a", ts("2024-01-01 12:00:00")), // exactly r2 → r2 (>= semantics)
      (3L, "a", ts("2024-01-01 13:00:00")) // after all → null
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      ("a", ts("2024-01-01 11:00:00"), 100.0), // r1
      ("a", ts("2024-01-01 12:00:00"), 200.0) // r2
    ).toDF("key", "rts", "price")
    val out = AsOfJoin
      .asofJoin(left, right, "key", "ts", "rts", direction = "forward")
      .collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[java.lang.Double]("price")))
      .toMap
    assert(out(1L).contains(100.0))
    assert(out(2L).contains(200.0), "right row at exactly left ts matches forward too")
    assert(out(3L).isEmpty, "no future right row → null")
  }

  test("tolerance nulls out matches beyond the allowed gap") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 09:30:00")), // 30 min after r1 → within 1h tol
      (2L, "a", ts("2024-01-01 11:30:00")) // 2.5 h after r1 → beyond tol
    ).toDF("event_id", "key", "ts")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 100.0)).toDF("key", "rts", "price")
    val out = AsOfJoin
      .asofJoin(left, right, "key", "ts", "rts", toleranceSec = Some(3600L))
      .collect()
      .map(r =>
        r.getAs[Long]("event_id") ->
          (Option(r.getAs[java.lang.Double]("price")), Option(r.getAs[java.sql.Timestamp]("asof_rts")))
      )
      .toMap
    assert(out(1L)._1.contains(100.0))
    assert(out(2L)._1.isEmpty && out(2L)._2.isEmpty, "stale match nulled under tolerance")
  }

  test("single shuffle plan: no join node, one window sort") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("event_id", "key", "ts")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 1.0)).toDF("key", "rts", "price")
    val plan = AsOfJoin.asofJoin(left, right, "key", "ts", "rts").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"composition must not plan a join:\n$plan")
    assert(plan.contains("Window"), "carried values use a window")
  }
}
