package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end scale measurement for the one-command corpus curation
  * job (`Pipeline.curateCorpus`: q106 LM gate → q104 span clean →
  * exact dedup → shard manifest) on a stress corpus. Both gates are
  * honest there: the q106 gate is CORPUS-RELATIVE (the bigram LM is
  * built from the corpus under test, so rep-prefixed tokens keep their
  * within-rep statistics) and q104 is hash-based — unlike the
  * token-identity quality rules StressCorpus's scaldoc warns about.
  *
  * Prints per-stage timings (gate, span clean incl. the shared
  * dup-position materialization, then the composed job) so the
  * composed number can be read against its parts — the composed job
  * shares the dup-position memo with the q104 timing, which is exactly
  * the production posture (features materialized once).
  *
  * Usage: runMain graft.tools.CurateStress <corpusParquetDir> [shards]
  */
object CurateStress {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/sf_stress")
    val shards = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("curate-stress").toString + "/curated"
    val nDocs = spark.read.parquet(s"$corpusDir/documents.parquet").count()
    println(s"[curate-stress] corpus docs: $nDocs, shards: $shards")
    val (nKeep, tGate) = timed(
      graft.queries.TextQueries
        .q106LmSurprisal(spark, corpusDir)
        .filter(col("keep_doc"))
        .count()
    )
    println(f"[curate-stress] stage q106 LM gate alone: $tGate%.1f s, keeps $nKeep of $nDocs")
    val (nClean, tClean) = timed(
      graft.queries.TextQueries.q104SpanClean(spark, corpusDir).count()
    )
    println(
      f"[curate-stress] stage q104 span clean alone (incl. dup-position materialization): $tClean%.1f s, $nClean docs"
    )
    val ((in, out2), tAll) = timed(
      graft.pipeline.Pipeline.curateCorpus(spark, corpusDir, out, shards)
    )
    println(
      f"[curate-stress] composed curate (gate→clean→dedup→manifest): $tAll%.1f s, $in -> $out2 docs"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(out).getParentFile
    )
    spark.stop()
  }
}
