package graft.tools

import graft.SparkEntry

/** Dump formatted physical plans for queries (plan-shape review tool).
  * Usage: runMain graft.tools.ExplainDump <sfDir> [q1,q2,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val spark = graft.GraftSession.local("graft-explain")
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq
      .sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n########## $name ##########")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
