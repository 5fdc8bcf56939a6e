package graft.tools

import org.apache.spark.sql.functions._

/** Scale measurements for the span-dedup family. Two modes:
  *
  * `runMain graft.tools.SpanStress <corpusParquetDir> <batchSfDir> [batchRows]`
  *   — the incremental span index: one-shot state build over a large
  *   corpus, a batch probed against that state, then the segmented
  *   fold's headline property measured directly: per-batch WRITE BYTES.
  *   The trickle fold is timed against a half-size and a full-size
  *   state (append cost must stay flat as state doubles, and must beat
  *   a legacy full-rewrite migration fold of identical content); the
  *   realistic batch reports bytes appended vs total state bytes — the
  *   O(batch)-not-O(state) claim, measured as bytes because at this sf
  *   seconds are overhead-dominated.
  *
  * `runMain graft.tools.SpanStress compact <corpusParquetDir>`
  *   — compaction cost vs bucket count: the same corpus is ingested
  *   into states pinned at 64 and at 512 buckets (plus trailing small
  *   batches so segments accumulate), then `compactSpanState` runs on
  *   each. Writer tasks are budgeted by BYTES (`spanWriteTasks`), so
  *   the two walls must match — compaction scales with data rewritten,
  *   not with how the creation-time bucket choice sliced it; the
  *   one-task-per-bucket shape this replaced would hand the 64-bucket
  *   state 8× the per-task payload. Also times a --buckets re-shard
  *   (64 -> 512) through the same path and verifies view identity.
  *
  * `runMain graft.tools.SpanStress zipf <corpusParquetDir>`
  *   — the hot-key window bound: every corpus doc gets the SAME
  *   boilerplate sentence appended (8 ultra-hot 3-grams, df = corpus
  *   size), then the shared dup-position pass runs with the df-cap
  *   split (hot spans bypass the window via the broadcast pre-flag)
  *   vs the pure-window shape (cap = MaxValue — the pre-fix plan,
  *   where each hot span's every instance lands in ONE window
  *   partition). Row counts must match exactly; the time ratio is the
  *   measured cost of the skew.
  */
object SpanStress {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("zipf")) zipf(args.lift(1).getOrElse("/tmp/sf_stress"))
    else if (args.headOption.contains("compact")) compact(args.lift(1).getOrElse("/tmp/sf_stress"))
    else ingest(args)
  }

  private def compact(corpusDir: String): Unit = {
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("span-compact-stress").toString
    val corpus = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = corpus.count()
    println(s"[span-compact] corpus docs: $n")
    val walls = Seq(64, 512).map { nb =>
      val state = s"$root/spans_$nb"
      graft.operators.Maintenance
        .incrementalDupSpans(
          spark, corpus, "doc_id", "text", state, Some(0L),
          stateBuckets = nb, maxStateSegments = 99
        )
      // Trailing batches so every bucket holds multiple segments.
      (1L to 3L).foreach { i =>
        val b = corpus
          .limit(200)
          .select((col("doc_id") + i * 10000000L).as("doc_id"), col("text"))
        graft.operators.Maintenance.incrementalDupSpans(
          spark, b, "doc_id", "text", state, Some(i),
          stateBuckets = nb, maxStateSegments = 99
        )
      }
      val bytes = {
        def sz(f: java.io.File): Long =
          if (f.isFile) f.length() else if (!f.exists()) 0L else f.listFiles().map(sz).sum
        sz(new java.io.File(state))
      }
      val ((done, total), t) = StressUtil.timed(
        graft.operators.Maintenance.compactSpanState(spark, state)
      )
      val target = graft.operators.Maintenance.SpanCompactTargetTaskBytes
      val perTask = math.min(bytes, target)
      val perBucketTask = bytes / nb
      println(
        f"[span-compact] buckets=$nb%-4d state ${bytes / 1024}%d KiB: compaction $t%.1f s ($done of $total partitions); " +
          f"per-task payload bound ${perTask / 1024}%d KiB (budget-driven) vs ${perBucketTask / 1024}%d KiB under one-task-per-bucket"
      )
      (nb, t)
    }
    println(
      f"[span-compact] wall ratio 512/64 buckets = ${walls.last._2 / walls.head._2}%.2f x. " +
        "Per-task WRITE payload is budget-driven (min(state, target)/task at any bucket count; pre-fix it was " +
        "state/buckets — ~1.5 TB/task for a 64-bucket 100 TB state). Residual wall growth at high bucket count " +
        "is per-partition-dir commit overhead (one rename+listing per dir), linear in buckets and independent " +
        "of data — the reason the default stays 64 with --buckets re-shard available, not a rewrite-size effect."
    )
    // Re-shard through the same path: 64 -> 512, view-invariant.
    val state = s"$root/spans_64"
    val viewBefore = graft.operators.Maintenance.spanStateView(spark, state).count()
    val (_, tReshard) = StressUtil.timed(
      graft.operators.Maintenance.compactSpanState(spark, state, newBuckets = Some(512))
    )
    val viewAfter = graft.operators.Maintenance.spanStateView(spark, state).count()
    require(viewBefore == viewAfter, s"re-shard changed the view: $viewBefore != $viewAfter")
    println(f"[span-compact] re-shard 64 -> 512 buckets: $tReshard%.1f s, view invariant ($viewAfter hashes)")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  private def hpMtimes(p: String): Map[String, Long] = {
    val f = new java.io.File(p)
    if (!f.exists()) Map.empty
    else
      f.listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("hp="))
        .map(d => d.getName -> d.lastModified())
        .toMap
  }

  private def dirBytes(f: java.io.File): Long =
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else f.listFiles().map(dirBytes).sum

  /** Bytes held by a batch's appended segments (`seg=b<id>` dirs). */
  private def segBytes(state: String, id: Long): Long = {
    val root = new java.io.File(state)
    if (!root.exists()) 0L
    else
      root
        .listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("hp="))
        .map(d => dirBytes(new java.io.File(d, s"seg=b$id")))
        .sum
  }

  private def ingest(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/sf_stress")
    val batchSf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val batchRows = args.lift(2).map(_.toInt).getOrElse(2000)
    val spark = StressUtil.session()
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("span-stress").toString
    val corpus = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nAll = corpus.count()
    println(s"[span-stress] corpus docs: $nAll")
    // One tiny trickle doc (6 shingle hashes -> a handful of buckets):
    // the continuous-ingest shape the partitioned fold exists for.
    def trickle(id: Long) =
      Seq((id, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    // The scaling claim, measured directly: fold the SAME trickle doc
    // into a half-size and a full-size state. The segmented append's
    // cost (seconds AND bytes) must stay flat as the state doubles;
    // the legacy full-rewrite (the migration fold on an unpartitioned
    // copy of identical semantic content) must grow with the state.
    val sizes = Seq(("half", corpus.filter(col("doc_id") % 2 === 0)), ("full", corpus))
    val results = sizes.map { case (label, c) =>
      val state = s"$root/spans_$label"
      val (e0, tBase) = StressUtil.timed(
        graft.operators.Maintenance
          .incrementalDupSpans(spark, c, "doc_id", "text", state, Some(0L))
      )
      println(f"[span-stress] $label%-4s base ingest (builds state): $tBase%.1f s, extents=${e0.count()}")
      val before = hpMtimes(state)
      graft.operators.SpanStateMeta.reset()
      val (_, tPart) = StressUtil.timed {
        graft.operators.Maintenance
          .incrementalDupSpans(spark, trickle(30000000L), "doc_id", "text", state, Some(1L))
          .count()
      }
      val metaCalls = graft.operators.SpanStateMeta.count
      val after = hpMtimes(state)
      val touched = (before.keySet ++ after.keySet).count(k => before.get(k) != after.get(k))
      val appended = segBytes(state, 1L)
      println(
        s"[span-stress] $label trickle driver metadata calls: $metaCalls for $touched touched buckets " +
          "(O(touched), manifest-driven tiering — never per accumulated segment)"
      )
      val legacy = s"$root/legacy_$label"
      val legacyBytes = {
        graft.operators.Maintenance
          .spanStateView(spark, state)
          .write
          .parquet(legacy)
        dirBytes(new java.io.File(legacy))
      }
      val (_, tFull) = StressUtil.timed {
        graft.operators.Maintenance
          .incrementalDupSpans(spark, trickle(30000001L), "doc_id", "text", legacy, Some(1L))
          .count()
      }
      println(
        f"[span-stress] $label%-4s trickle fold: append $tPart%.2f s / ${appended / 1024}%d KiB (touched $touched of ${after.size} partitions), full rewrite $tFull%.2f s / ${legacyBytes / 1024}%d KiB state"
      )
      (tPart, appended, tFull, legacyBytes)
    }
    val (pHalf, aHalf, fHalf, lHalf) = results.head
    val (pFull, aFull, fFull, lFull) = results.last
    println(
      f"[span-stress] state 2x => append ${pFull / pHalf}%.2f x time / ${aFull.toDouble / math.max(aHalf, 1)}%.2f x bytes (flat is 1.0); full rewrite ${fFull / fHalf}%.2f x time / ${lFull.toDouble / math.max(lHalf, 1)}%.2f x bytes (grows with state)"
    )
    // Headline batch: realistic ingest volume against the full state.
    // Bytes are the honest metric at this sf (seconds are fixed-cost
    // dominated): the append writes the batch's partial, never the
    // state — and the batch touching EVERY partition no longer matters,
    // because touching a partition now means adding one segment to it.
    val state = s"$root/spans_full"
    val batch = spark.read
      .parquet(s"$batchSf/documents.parquet")
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .limit(batchRows)
    val stateBytesBefore = dirBytes(new java.io.File(state))
    graft.operators.SpanStateMeta.reset()
    val (e1, tBatch) = StressUtil.timed(
      graft.operators.Maintenance
        .incrementalDupSpans(spark, batch, "doc_id", "text", state, Some(2L))
    )
    val batchMeta = graft.operators.SpanStateMeta.count
    val nExt = e1.count()
    val appended = segBytes(state, 2L)
    println(
      f"[span-stress] batch ingest ($batchRows docs vs full state): $tBatch%.1f s, extents=$nExt, wrote ${appended / 1024}%d KiB vs ${stateBytesBefore / 1024}%d KiB state (${100.0 * appended / math.max(stateBytesBefore, 1)}%.1f%%); $batchMeta driver metadata calls over 64 buckets"
    )
    // High-bucket-count hold: the SAME batch against a 512-bucket pin.
    // The per-batch driver fan-out must stay a small constant per
    // touched bucket (manifest-driven tiering), so the ingest number
    // holds as the bucket count scales toward object-store reality.
    val hb = s"$root/spans_hb"
    graft.operators.Maintenance
      .incrementalDupSpans(
        spark, corpus, "doc_id", "text", hb, Some(0L), stateBuckets = 512
      )
    val hbBatch = batch.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    graft.operators.SpanStateMeta.reset()
    val (e2, tHb) = StressUtil.timed(
      graft.operators.Maintenance.incrementalDupSpans(spark, hbBatch, "doc_id", "text", hb, Some(1L))
    )
    val hbMeta = graft.operators.SpanStateMeta.count
    val nExt2 = e2.count()
    println(
      f"[span-stress] batch ingest vs 512-BUCKET state: $tHb%.1f s, extents=$nExt2, $hbMeta driver metadata calls " +
        f"(${hbMeta / 512.0}%.1f per touched bucket — O(touched buckets) at 8x the bucket count)"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  private def zipf(corpusDir: String): Unit = {
    val spark = StressUtil.session()
    graft.functions.GraftFunctions.register(spark)
    val boiler = "the quick brown fox jumps over the lazy dog end"
    val d = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), concat(col("text"), lit(" " + boiler)).as("text"))
      .localCheckpoint() // settle so both shapes read identical input
    val n = d.count()
    println(s"[span-stress] zipf corpus: $n docs, boilerplate df = $n per hot 3-gram")
    // The structural number that decides survival at corpus scale: the
    // LARGEST single window partition each shape buffers in one task.
    // Pure window: the head 3-gram's full df — grows linearly with the
    // corpus (10^9+ instances at 100 TB, one task's buffer). Capped:
    // <= SpanDfCap by construction, at any corpus size.
    val dfs = d
      .select(
        posexplode(
          graft.functions.GraftFunctions.graft_shingles_pos(split(col("text"), "\\s+"))
        ).as(Seq("pos", "h"))
      )
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
    val maxDf = dfs.agg(max(col("df"))).collect()(0).getLong(0)
    val cap = graft.queries.TextQueries.SpanDfCap
    val maxCold = dfs.filter(col("df") <= cap).agg(max(col("df"))).collect()(0).getLong(0)
    println(
      s"[span-stress] max window-partition rows: pure=$maxDf (grows with corpus), df-cap split=$maxCold (<= $cap at ANY corpus size)"
    )
    val (capped, tCapped) = StressUtil.timed(
      graft.queries.TextQueries.dupPositionsOf(d, cap).count()
    )
    println(f"[span-stress] df-cap split (hot spans bypass the window): $tCapped%.1f s, $capped rows")
    val (pure, tPure) = StressUtil.timed(
      graft.queries.TextQueries.dupPositionsOf(d, Int.MaxValue).count()
    )
    println(
      f"[span-stress] pure window (pre-fix shape, head key in ONE partition): $tPure%.1f s, $pure rows"
    )
    require(capped == pure, s"df-cap split must be exact: $capped != $pure")
    println(
      f"[span-stress] wall-clock ratio at this sf: split/pure = ${tCapped / tPure}%.2f x — the split pays " +
        "an extra bounded corpus pass to make the buffer bound structural; at head-df x1000 the pure " +
        "window's single-task buffer is the one that stops fitting"
    )
    spark.stop()
  }
}
