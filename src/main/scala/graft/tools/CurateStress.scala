package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end scale measurements for corpus curation on a stress
  * corpus. Two modes:
  *
  * `runMain graft.tools.CurateStress <corpusParquetDir> [shards]`
  *   — the one-command BATCH job (`Pipeline.curateCorpus`: q106 LM
  *   gate → q104 span clean → exact dedup → shard manifest). Both
  *   gates are honest there: the q106 gate is CORPUS-RELATIVE (the
  *   bigram LM is built from the corpus under test, so rep-prefixed
  *   tokens keep their within-rep statistics) and q104 is hash-based —
  *   unlike the token-identity quality rules StressCorpus's scaladoc
  *   warns about. Prints per-stage timings (gate, span clean incl. the
  *   shared dup-position materialization, then the composed job) so
  *   the composed number can be read against its parts.
  *
  * `runMain graft.tools.CurateStress ingest <corpusParquetDir> [batchRows]`
  *   — the INCREMENTAL loop (`Pipeline.curateIngest`): freeze the
  *   quality model from the corpus, backfill the whole corpus as
  *   batch 0 (building the span state + hash index), then time a
  *   re-crawl-shaped batch (corpus docs under fresh ids) against the
  *   populated states. The claim under test: the steady-state
  *   per-batch cost scales with the batch, not the accumulated
  *   corpus — the span probe partition-prunes, the fold appends, the
  *   dedup probe is one keyed anti-join.
  */
object CurateStress {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("ingest"))
      ingest(args.lift(1).getOrElse("/tmp/sf_stress"), args.lift(2).map(_.toInt).getOrElse(2000))
    else batch(args)

  private def ingest(corpusDir: String, batchRows: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("curate-ingest-stress").toString
    val (model, spans, index, out) = (s"$root/lm", s"$root/spans", s"$root/index", s"$root/out")
    val docs = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val (_, tModel) = StressUtil.timed(
      graft.operators.QualityModel.build(spark, docs, "doc_id", "text", model)
    )
    println(f"[curate-ingest] model freeze over $n docs: $tModel%.1f s (the scheduled retrain)")
    val ((in0, out0), t0) = StressUtil.timed(
      graft.pipeline.Pipeline.curateIngest(spark, docs, model, spans, index, out, 0L)
    )
    println(f"[curate-ingest] backfill batch ($in0 docs, empty states): $t0%.1f s, accepted $out0")
    // Re-crawl-shaped steady-state batch: corpus docs under fresh ids —
    // in-vocab for the frozen gate, worst case for both dedup stages.
    val b1 = docs.limit(batchRows).select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val ((in1, out1), t1) = StressUtil.timed(
      graft.pipeline.Pipeline.curateIngest(spark, b1, model, spans, index, out, 1L)
    )
    println(
      f"[curate-ingest] steady-state batch ($in1 docs vs $n-doc states): $t1%.1f s, accepted $out1 (re-crawl: span-cut or hash-dropped)"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  private def batch(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/sf_stress")
    val shards = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = StressUtil.session()
    val out = java.nio.file.Files.createTempDirectory("curate-stress").toString + "/curated"
    val nDocs = spark.read.parquet(s"$corpusDir/documents.parquet").count()
    println(s"[curate-stress] corpus docs: $nDocs, shards: $shards")
    // Evict the session feature memo before EVERY stage so each timed
    // number includes its own materialization — without this, the
    // composed run silently rides the dup-position tables the
    // standalone q104 timing just built, and the printed composed
    // figure understates a cold run.
    graft.queries.TextQueries.clearFeatureMemo()
    val (nKeep, tGate) = StressUtil.timed(
      graft.queries.TextQueries
        .q106LmSurprisal(spark, corpusDir)
        .filter(col("keep_doc"))
        .count()
    )
    println(f"[curate-stress] stage q106 LM gate alone: $tGate%.1f s, keeps $nKeep of $nDocs")
    graft.queries.TextQueries.clearFeatureMemo()
    val (nClean, tClean) = StressUtil.timed(
      graft.queries.TextQueries.q104SpanClean(spark, corpusDir).count()
    )
    println(
      f"[curate-stress] stage q104 span clean alone (incl. dup-position materialization): $tClean%.1f s, $nClean docs"
    )
    graft.queries.TextQueries.clearFeatureMemo()
    val ((in, out2), tAll) = StressUtil.timed(
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
