package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by hashed n-gram importance weighting — the
  * DSIR family (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling", arXiv:2302.03169): score every
  * raw-corpus document by how TARGET-LIKE its hashed bigram profile
  * is, where the target is a small curated seed set (a quality
  * corpus, a domain sample), then keep the top slice. The published
  * method estimates bag-of-hashed-ngrams importance weights
  * log p_target(b) − log p_raw(b) per bucket and resamples by the
  * summed log ratio; this engine's variant keeps the same structure —
  * hash bigrams into a fixed bucket space, estimate per-bucket
  * target/raw affinity, score a document additively over its bigram
  * occurrences — but replaces the log ratio with the smoothed COUNT
  * RATIO in exact integer micro-units:
  *
  *   w_micro(b) = ((n_target(b) + 1) · 10⁶) / (n_raw(b) + 1)   (floor)
  *
  * A log is libm territory (bit-divergent across engines), while the
  * smoothed ratio is monotone in the same per-bucket evidence,
  * additive per occurrence, and replayable to the bit in any engine —
  * the repo-wide integer-arithmetic contract. The selection is
  * deterministic top-k by length-normalized score (the paper's
  * Gumbel resampling needs a random source; a seeded variant can sit
  * on top of these scores without changing them).
  *
  * Scale shape: two bigram-explode passes over the raw corpus — one
  * to histogram buckets (output O(buckets), map-side partials do the
  * heavy lifting), one to score documents against the BROADCAST
  * bucket table (O(buckets) rows by construction — never a shuffle
  * on the corpus side beyond the per-doc agg). Text never enters a
  * shuffle: bigrams reduce to bucket ids at the projection. The
  * top-k select is `TakeOrderedAndProject` (per-partition heads,
  * never a global sort). At 100 TB the weight pass can run on a
  * sample without changing the scoring plan.
  */
object Importance {

  /** 28-bit portable hash (md5 prefix) — the engine's cross-engine
    * deterministic hash convention (DuckDB replays it verbatim).
    */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** One row per bigram OCCURRENCE: `(…idCols, bucket)` — whitespace
    * tokens (empties dropped), adjacent pairs joined by one space,
    * hashed into `buckets` ids. Pure projections + one explode; no
    * shuffle, no UDF, stays in whole-stage codegen.
    */
  private def bigramBuckets(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      keep: Column*
  ): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    val grams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b)
    )
    df.select(keep :+ explode(grams).as("__gram"): _*)
      .withColumn("bucket", h28(col("__gram")) % buckets)
      .drop("__gram")
  }

  /** The per-bucket affinity table: `(bucket, n_raw, n_target,
    * w_micro)` over the raw corpus, where `isTargetCol` marks the
    * curated seed subset (target ⊆ raw — the DSIR setting; a
    * disjoint target corpus can be unioned in with the flag set).
    * One groupBy on O(buckets) keys; `w_micro` is the add-one
    * smoothed ratio in exact micro-units (floor — nonnegative
    * operands, so `div` IS floor).
    */
  def ngramImportanceWeights(
      raw: DataFrame,
      textCol: String,
      isTargetCol: String,
      buckets: Int = 1024
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    bigramBuckets(raw, textCol, buckets, col(isTargetCol).as("__t"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_target")
      )
      .select(
        col("bucket"),
        col("n_raw"),
        col("n_target"),
        expr("((n_target + 1) * 1000000L) div (n_raw + 1)").as("w_micro")
      )
  }

  /** [[ngramImportanceWeights]] for a target corpus that lives in its
    * OWN table (the common campaign shape: the curated seed set is a
    * separate dataset, not a flag on the raw corpus): bucket
    * histograms per side, one O(buckets) full-outer join, the same
    * smoothed micro-ratio. When `target`'s rows are also present in
    * `raw` (the subset setting), this equals the flag form
    * bit-for-bit (spec'd). Buckets absent from BOTH sides carry no
    * evidence and emit no row — a scored document's unseen-bucket
    * bigram simply finds no weight (the inner scoring join), exactly
    * like the flag form.
    */
  def ngramImportanceWeightsFrom(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 1024
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val nRaw = bigramBuckets(raw, textCol, buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_raw"))
    val nTgt = bigramBuckets(target, textCol, buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_target"))
    nRaw
      .join(nTgt, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("n_raw"), lit(0L)).as("n_raw"),
        coalesce(col("n_target"), lit(0L)).as("n_target")
      )
      .withColumn("w_micro", expr("((n_target + 1) * 1000000L) div (n_raw + 1)"))
  }

  /** Per-document importance scores against a weight table:
    * `(idCol, n_bigrams, score_micro, avg_micro)` — the summed
    * bucket weight over the document's bigram occurrences and its
    * length-normalized mean (floor; both exact). Documents with no
    * bigram (≤ 1 token) carry no evidence and emit no row — score
    * them by a length gate upstream, not here. The weight table is
    * O(buckets) rows and is BROADCAST; the only corpus-keyed agg is
    * the per-doc roll-up.
    */
  def importanceScores(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 1024
  ): DataFrame =
    bigramBuckets(raw, textCol, buckets, col(idCol))
      .join(broadcast(weights.select(col("bucket"), col("w_micro"))), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("w_micro")).as("score_micro")
      )
      .withColumn("avg_micro", expr("score_micro div n_bigrams"))

  /** Pin the bucket count to a frozen weight table as a `_buckets`
    * sidecar — the [[Packing.recordBudget]] discipline: scoring hashes
    * bigrams `mod buckets`, so a consumer scoring with a DIFFERENT
    * bucket count joins every bigram to the WRONG bucket's weight and
    * produces silently garbage scores. First writer records; any later
    * explicit value must agree (loud failure); same-value re-record is
    * a no-op.
    */
  def recordBuckets(spark: org.apache.spark.sql.SparkSession, dir: String, buckets: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    storedBuckets(spark, dir) match {
      case Some(b) =>
        require(
          b == buckets,
          s"buckets $buckets disagrees with the bucket count these weights were frozen with " +
            s"($b, recorded in $dir/_buckets): scoring would hash bigrams into the wrong " +
            "buckets — pass the recorded count or re-freeze the weights"
        )
      case None =>
        fs.mkdirs(root)
        Maintenance.writeTextFile(fs, new org.apache.hadoop.fs.Path(root, "_buckets"), buckets.toString)
    }
  }

  /** The bucket count a weight table was frozen with, if recorded. */
  def storedBuckets(spark: org.apache.spark.sql.SparkSession, dir: String): Option[Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Maintenance.readTextFile(fs, new org.apache.hadoop.fs.Path(root, "_buckets")).map(_.trim.toInt)
  }

  /** Deterministic top-k selection by length-normalized importance —
    * ties broken by the id so the kept SET is a total function of
    * the scores. Plans as `TakeOrderedAndProject` (per-partition
    * top-k then one k-row merge), never a global sort.
    */
  def selectByImportance(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("avg_micro").desc, col(idCol).asc).limit(k)
}
