package graft.tools

/** Dump the formatted plan of the SHARED feature passes that registry
  * queries consume through the session memo (the memo pin hides them
  * from ExplainDump). Usage: runMain graft.tools.ExplainFeature <sfDir>
  */
object ExplainFeature {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-explain-feature")
    println("\n########## feature:dup_positions ##########")
    println(
      graft.queries.TextQueries
        .dupPositionsDf(spark, sfDir)
        .queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
