package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Correctness + plan shape for the bucketed range join: it must equal
  * the naive range-predicate join (including negative values, where
  * floor-division bucketing matters) while planning as an EQUI join on
  * the bucket key rather than a cartesian/nested-loop product.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-rangejoin-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("bucketed range join equals the naive range-predicate join") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 20L),   // spans two 7-wide buckets
      (2L, 15L, 15L),   // degenerate single-point interval
      (3L, 100L, 140L), // spans many buckets
      (4L, -25L, -5L)   // negative range: floor division, not truncation
    ).toDF("lid", "lo", "hi")
    val right =
      Seq(9L, 10L, 15L, 20L, 21L, 120L, -10L, -26L, -5L).toDF("v")

    val got = RangeJoin
      .rangeJoin(left, right, "lo", "hi", "v", 7L)
      .select("lid", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = left
      .crossJoin(right)
      .filter($"v" >= $"lo" && $"v" <= $"hi")
      .select("lid", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    assert(got == want, s"bucketed=$got naive=$want")
    assert(want.contains((4L, -10L)), "negative-bucket match expected in the fixture")
    assert(!got.contains((4L, -26L)), "out-of-range value sharing a bucket must be filtered")
  }

  test("property: bucketed == naive on random intervals/values/widths") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      intervals <- Gen.listOfN(
        25,
        for {
          lo <- Gen.chooseNum(-1000L, 1000L)
          len <- Gen.chooseNum(0L, 300L)
        } yield (lo, lo + len)
      )
      values <- Gen.listOfN(60, Gen.chooseNum(-1100L, 1100L))
      width <- Gen.chooseNum(1L, 400L)
    } yield (intervals, values, width)
    (1 to 5).foreach { i =>
      val (intervals, values, width) =
        gen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val l = intervals.zipWithIndex
        .map { case ((lo, hi), id) => (id.toLong, lo, hi) }
        .toDF("lid", "lo", "hi")
      val r = values.toDF("v")
      val got = RangeJoin
        .rangeJoin(l, r, "lo", "hi", "v", width)
        .select("lid", "v")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)))
        .sorted
        .toSeq
      val want = l
        .crossJoin(r)
        .where($"v" >= $"lo" && $"v" <= $"hi")
        .select("lid", "v")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)))
        .sorted
        .toSeq
      assert(got == want, s"seed=${7 + i} width=$width")
    }
  }

  test("optimizer rule rewrites a naive range-predicate join to the bucketed form") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L), (2L, 50L, 90L), (3L, -25L, -5L))
      .toDF("lid", "lo", "hi")
    val values = Seq(9L, 10L, 15L, 20L, 60L, 89L, -10L, -26L).toDF("v")
    def naive = values.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")

    val before = naive.queryExecution.executedPlan.toString
    assert(
      before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      s"without the rule Spark nested-loops this join:\n$before"
    )
    val expected = naive
      .select("lid", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRewrite)
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "16")
    try {
      val after = naive.queryExecution.executedPlan.toString
      assert(
        !after.contains("BroadcastNestedLoopJoin") && !after.contains("CartesianProduct"),
        s"rule should have rewritten to an equi join:\n$after"
      )
      assert(after.contains("__graft_bucket"), s"bucket key expected:\n$after")
      val got = naive
        .select("lid", "v")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(got == expected, s"rewrite changed results: got=$got want=$expected")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
    }
  }

  test("bucketing is exact above 2^53 (no double rounding in floor division)") {
    import spark.implicits._
    // Full-range keys: doubles have 512-ulp spacing here, so any double
    // division in the bucketing would compute approximate bucket ids.
    val base = (1L << 62) - 3
    val left = Seq(
      (1L, base - 2, base + 2),
      (2L, base + 3, base + 3),
      (3L, -base - 2, -base + 2)
    ).toDF("lid", "lo", "hi")
    val right =
      Seq(base - 3, base - 2, base, base + 2, base + 3, base + 4, -base, -base - 3).toDF("v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs(left.crossJoin(right).filter($"v" >= $"lo" && $"v" <= $"hi"))
    Seq(1L, 3L, 7L, 1024L).foreach { w =>
      val got = pairs(RangeJoin.rangeJoin(left, right, "lo", "hi", "v", w))
      assert(got == want, s"width=$w: got=$got want=$want")
    }
  }

  test("optimizer rule rewrites left-outer / semi / anti with the value side preserved") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L), (2L, 50L, 90L), (3L, -25L, -5L))
      .toDF("lid", "lo", "hi")
    val values = Seq(9L, 10L, 15L, 20L, 60L, 89L, -10L, -26L, 999L).toDF("v")
    // Value side LEFT, intervals right: the exploded side is non-preserved.
    def outer = values.join(intervals, $"v" >= $"lo" && $"v" <= $"hi", "left_outer")
    def semi = values.join(intervals, $"v" >= $"lo" && $"v" <= $"hi", "left_semi")
    def anti = values.join(intervals, $"v" >= $"lo" && $"v" <= $"hi", "left_anti")
    def outerRows = outer
      .select($"v", $"lid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
      .sorted
    def vs(df: org.apache.spark.sql.DataFrame) =
      df.select("v").collect().map(_.getLong(0)).toSeq.sorted
    val (wantOuter, wantSemi, wantAnti) = (outerRows, vs(semi), vs(anti))
    assert(wantOuter.exists(_._2.isEmpty), "fixture needs an unmatched value row")
    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRewrite)
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "16")
    try {
      Seq(("outer", outer), ("semi", semi), ("anti", anti)).foreach { case (n, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(
          !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"$n should be bucket-rewritten:\n$plan"
        )
        assert(plan.contains("__graft_bucket"), s"$n: bucket key expected:\n$plan")
      }
      assert(outerRows == wantOuter, "left-outer rewrite changed results")
      assert(vs(semi) == wantSemi, "left-semi rewrite changed results")
      assert(vs(anti) == wantAnti, "left-anti rewrite changed results")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
    }
  }

  test("optimizer rule declines joins that would preserve the exploded interval side") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L), (2L, 50L, 90L)).toDF("lid", "lo", "hi")
    val values = Seq(9L, 15L, 60L, 999L).toDF("v")
    // Intervals LEFT and preserved: a bucket rewrite would emit one
    // null-padded row per covering bucket — must stay untouched.
    def badOuter = intervals.join(values, $"v" >= $"lo" && $"v" <= $"hi", "left_outer")
    val want = badOuter
      .select($"lid", $"v")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
      .sorted
    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRewrite)
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "16")
    try {
      val plan = badOuter.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bucket"), s"must not rewrite a preserved interval side:\n$plan")
      val got = badOuter
        .select($"lid", $"v")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq
        .sorted
      assert(got == want)
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
    }
  }

  test("property: the optimizer rule preserves inner and left-outer results on random data") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      intervals <- Gen.listOfN(15, for {
        lo <- Gen.chooseNum(-500L, 500L)
        len <- Gen.chooseNum(0L, 200L)
      } yield (lo, lo + len))
      values <- Gen.listOfN(40, Gen.chooseNum(-600L, 600L))
      width <- Gen.chooseNum(1L, 300L)
    } yield (intervals, values, width)
    (1 to 3).foreach { s =>
      val (intervals, values, width) = gen.pureApply(Gen.Parameters.default, Seed(31L + s))
      val l = intervals.zipWithIndex.map { case ((lo, hi), id) => (id.toLong, lo, hi) }
        .toDF("lid", "lo", "hi")
      val r = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vid", "v")
      def inner = r.join(l, $"v" >= $"lo" && $"v" <= $"hi")
      def louter = r.join(l, $"v" >= $"lo" && $"v" <= $"hi", "left_outer")
      def innerRows = inner
        .select($"vid", $"lid")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)))
        .sorted
        .toSeq
      def louterRows = louter
        .select($"vid", $"lid")
        .collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .sorted
        .toSeq
      val (wantI, wantL) = (innerRows, louterRows)
      spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRewrite)
      spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, width.toString)
      try {
        assert(inner.queryExecution.executedPlan.toString.contains("__graft_bucket"))
        assert(innerRows == wantI, s"seed=${31 + s} width=$width inner mismatch")
        assert(louterRows == wantL, s"seed=${31 + s} width=$width left-outer mismatch")
      } finally {
        spark.experimental.extraOptimizations = Nil
        spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
      }
    }
  }

  test("q40 plans as a bucket equi join — no cartesian or nested-loop join") {
    val plan = queries.CoreQueries
      .q40RangeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
    assert(plan.contains("__bucket"), s"bucket key expected in the join:\n$plan")
  }
}
