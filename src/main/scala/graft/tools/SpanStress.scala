package graft.tools

import org.apache.spark.sql.functions._

/** Scale measurement for the incremental span index: one-shot state
  * build over a large corpus vs a small batch probed against that
  * state — the claim under test is "per-batch cost scales with the
  * batch, not the corpus". Usage:
  * `runMain graft.tools.SpanStress <corpusParquetDir> <batchSfDir> [batchRows]`
  * (corpus dir holds documents.parquet, e.g. the StressCorpus output).
  */
object SpanStress {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/sf_stress")
    val batchSf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val batchRows = args.lift(2).map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("span-stress").toString
    val state = s"$root/spans"
    val corpus = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[span-stress] corpus docs: ${corpus.count()}")
    var t0 = System.nanoTime()
    val e0 = graft.operators.Maintenance
      .incrementalDupSpans(spark, corpus, "doc_id", "text", state, Some(0L))
    println(
      f"[span-stress] base ingest (builds state): ${(System.nanoTime() - t0) / 1e9}%.1f s, extents=${e0.count()}"
    )
    // Doc-disjoint batch: shifted ids from the small-sf corpus.
    val batch = spark.read
      .parquet(s"$batchSf/documents.parquet")
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .limit(batchRows)
    t0 = System.nanoTime()
    val e1 = graft.operators.Maintenance
      .incrementalDupSpans(spark, batch, "doc_id", "text", state, Some(1L))
    println(
      f"[span-stress] batch ingest ($batchRows docs vs corpus state): ${(System.nanoTime() - t0) / 1e9}%.1f s, extents=${e1.count()}"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
