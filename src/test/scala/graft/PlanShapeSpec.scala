package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties that make these queries scale
  * must stay in the physical plan, not just in intent.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-plan-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: filter and projection pushed to the parquet scan") {
    val plan = planOf(CoreQueries.q2FilterProject(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"), plan)
    assert(!plan.contains("props:string,"), "no over-read columns")
  }

  test("q1: shipdate predicate reaches the scan; aggregate is partial+final") {
    val plan = planOf(CoreQueries.q1PricingSummary(spark, sf))
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q12: star join broadcasts every dimension (fact side never shuffles pre-agg)") {
    val plan = planOf(CoreQueries.q12StarJoin(spark, sf))
    assert(plan.split("BroadcastHashJoin").length >= 5, s"4 broadcast joins expected:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no SMJ in the dim-join chain")
  }

  test("q9: top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(CoreQueries.q9TopK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q24: brute-force ANN keeps the native dot product in the plan") {
    val plan = planOf(queries.VectorQueries.q24KnnBrute(spark, sf))
    assert(plan.contains("graft_dot"), s"native expression expected:\n$plan")
  }
}
