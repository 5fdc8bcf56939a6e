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
  * `runMain graft.tools.CurateStress zipf <corpusParquetDir> [shards]`
  *   — the composed batch + incremental jobs on a HOT-KEY corpus
  *   (same boilerplate sentence appended to every doc): proves the
  *   compositions inherit the df-cap window bound (max window
  *   partition ≤ SpanDfCap at any corpus size) and measures their
  *   wall-clock under maximal span skew.
  *
  * `runMain graft.tools.CurateStress stream <corpusParquetDir> [batchRows]`
  *   — the `curate_stream` steady state: backfill drain, then a
  *   re-crawl file's drain against populated states from a checkpoint
  *   restart — the batch verb's number plus engine overhead.
  *
  * `runMain graft.tools.CurateStress pack <corpusParquetDir> [nBatches] [rowsPerBatch]`
  *   — incremental packing over a long crawl: per-batch wall windows
  *   must stay flat as the pack space ages (layout O(batch), offset
  *   state tiny).
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
    else if (args.headOption.contains("zipf"))
      zipf(args.lift(1).getOrElse("/tmp/sf_stress"), args.lift(2).map(_.toInt).getOrElse(64))
    else if (args.headOption.contains("stream"))
      stream(args.lift(1).getOrElse("/tmp/sf_stress"), args.lift(2).map(_.toInt).getOrElse(2000))
    else if (args.headOption.contains("chain"))
      chain(args.lift(1).getOrElse("/tmp/sf_stress"), args.lift(2).map(_.toInt).getOrElse(2000))
    else if (args.headOption.contains("batches"))
      batches(
        args.lift(1).getOrElse("/tmp/sf_stress"),
        args.lift(2).map(_.toInt).getOrElse(120),
        args.lift(3).map(_.toInt).getOrElse(200)
      )
    else if (args.headOption.contains("pack"))
      pack(
        args.lift(1).getOrElse("/tmp/sf_stress"),
        args.lift(2).map(_.toInt).getOrElse(120),
        args.lift(3).map(_.toInt).getOrElse(200)
      )
    else if (args.headOption.contains("epochs"))
      epochsStress(
        args.lift(1).map(_.toLong).getOrElse(24000000L),
        args.lift(2).map(_.toInt).getOrElse(2)
      )
    else if (args.headOption.contains("resume"))
      resumeStress(
        args.lift(1).map(_.toLong).getOrElse(24000000L),
        args.lift(2).map(_.toInt).getOrElse(2)
      )
    else if (args.headOption.contains("vocab_build"))
      vocabBuildStress(
        args.lift(1).map(_.toLong).getOrElse(15000000L),
        args.lift(2).map(_.toLong).getOrElse(2000000L),
        args.lift(3).map(_.toInt).getOrElse(64)
      )
    else if (args.headOption.contains("vocab"))
      vocabStress(args.lift(1).map(_.toLong).getOrElse(10000000L))
    else if (args.headOption.contains("bpe"))
      bpeStress(
        args.lift(1).map(_.toLong).getOrElse(1000000L),
        args.lift(2).map(_.toInt).getOrElse(2000),
        args.lift(3).map(_.toLong).getOrElse(200000L)
      )
    else if (args.headOption.contains("provenance"))
      provenanceStress(
        args.lift(1).map(_.toLong).getOrElse(20000000L),
        args.lift(2).map(_.toInt).getOrElse(64)
      )
    else if (args.headOption.contains("diff"))
      diffStress(args.lift(1).map(_.toLong).getOrElse(50000000L))
    else if (args.headOption.contains("decontam"))
      decontamStress(
        args.lift(1).map(_.toLong).getOrElse(5000000L),
        args.lift(2).map(_.toLong).getOrElse(5000L)
      )
    else if (args.headOption.contains("fuzzy"))
      fuzzyStress(
        args.lift(1).map(_.toLong).getOrElse(5000000L),
        args.lift(2).map(_.toLong).getOrElse(5000L),
        args.lift(3).map(_.toInt).getOrElse(16),
        args.lift(4).map(_.toInt).getOrElse(4)
      )
    else if (args.headOption.contains("semantic"))
      semanticStress(
        args.lift(1).map(_.toLong).getOrElse(1000000L),
        args.lift(2).map(_.toLong).getOrElse(1000L)
      )
    else if (args.headOption.contains("turns_stream"))
      turnsStreamStress(args.lift(1).map(_.toLong).getOrElse(2000000L))
    else if (args.headOption.contains("turns_backfill"))
      turnsBackfillStress(
        args.lift(1).map(_.toLong).getOrElse(200000L),
        args.lift(2).map(_.toInt).getOrElse(100)
      )
    else if (args.headOption.contains("tree_state"))
      treeStateStress(
        args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(100),
        args.lift(3).map(_.toInt).getOrElse(256)
      )
    else if (args.headOption.contains("dpo_full"))
      dpoFullStress(
        args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(10)
      )
    else if (args.headOption.contains("dpo"))
      dpoReleaseStress(
        args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(10)
      )
    else if (args.headOption.contains("branch_render"))
      branchRenderStress(
        args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(20),
        args.lift(3).map(_.toInt).getOrElse(10)
      )
    else if (args.headOption.contains("sft_tree"))
      sftTreeStress(
        args.lift(1).map(_.toLong).getOrElse(400000L),
        args.lift(2).map(_.toInt).getOrElse(20),
        args.lift(3).map(_.toInt).getOrElse(30)
      )
    else if (args.headOption.contains("sft"))
      sftStress(
        args.lift(1).map(_.toLong).getOrElse(200000L),
        args.lift(2).map(_.toInt).getOrElse(10),
        args.lift(3).map(_.toInt).getOrElse(30)
      )
    else if (args.headOption.contains("pref_ingest"))
      prefIngestStress(
        args.lift(1).map(_.toInt).getOrElse(12),
        args.lift(2).map(_.toLong).getOrElse(2000000L),
        args.lift(3).map(_.toInt).getOrElse(50)
      )
    else if (args.headOption.contains("pref"))
      prefStress(
        args.lift(1).map(_.toLong).getOrElse(50000000L),
        args.lift(2).map(_.toInt).getOrElse(50)
      )
    else if (args.headOption.contains("dedup"))
      dedup(
        args.lift(1).getOrElse("/tmp/sf_stress"),
        args.lift(2).map(_.toInt).getOrElse(120),
        args.lift(3).map(_.toInt).getOrElse(200)
      )
    else if (args.headOption.contains("lease"))
      leaseStress(
        args.lift(1).map(_.toInt).getOrElse(8),
        args.lift(2).map(_.toInt).getOrElse(200)
      )
    else batch(args)

  /** `lease [threads] [rounds]` — measured mutual exclusion of the
    * writer-lease claim on THIS filesystem: `threads` threads race
    * `rounds` claim/release cycles each on ONE state path (unique
    * adhoc tokens, so every pairwise overlap must refuse), and an
    * atomic in-body occupancy counter records any instant two holders
    * were inside simultaneously. The claim protocol is documented
    * HDFS-semantics-only (rename-onto-existing fails there; raw local
    * fs rename OVERWRITES, leaving a window the post-claim verify
    * read narrows but cannot fully close) — this arm turns that
    * caveat into a measured local number instead of a theoretical
    * note. Violations are REPORTED, not asserted: the claim is about
    * HDFS; the local number documents how narrow the window is where
    * the specs actually run.
    */
  private def leaseStress(nThreads: Int, rounds: Int): Unit = {
    leaseStressMode(nThreads, rounds, backoffMs = 0)
    leaseStressMode(nThreads, rounds, backoffMs = 5)
  }

  private def leaseStressMode(nThreads: Int, rounds: Int, backoffMs: Int): Unit = {
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("graft-lease-stress").toString
    val state = s"$root/state"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val successes = new java.util.concurrent.atomic.AtomicInteger(0)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CyclicBarrier(nThreads)
    val t0 = System.nanoTime()
    val threads = (0 until nThreads).map { _ =>
      new Thread(() => {
        start.await()
        var r = 0
        while (r < rounds) {
          try {
            graft.operators.Maintenance.leaseStressProbe(fs, state) {
              val now = inside.incrementAndGet()
              if (now > 1) violations.incrementAndGet()
              // a short dwell widens the overlap window the fence must refuse
              Thread.sleep(0, 200000)
              inside.decrementAndGet()
            }
            successes.incrementAndGet()
          } catch {
            case _: IllegalArgumentException =>
              refusals.incrementAndGet()
              // backoffMs > 0 models a real retrying scheduler; the
              // zero-backoff mode is the adversarial continuous storm
              // (see the printed caveat)
              if (backoffMs > 0)
                Thread.sleep(1L + scala.util.Random.nextInt(backoffMs))
            case e: Throwable =>
              // anything else is a protocol bug, not a refusal — count
              // it loudly instead of letting the thread die silently
              // (the first run of this arm found exactly such a bug:
              // readTextFile's exists->open racing a release's delete)
              errors.incrementAndGet()
              System.err.println(s"[lease-stress] unexpected: $e")
          }
          r += 1
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"lease[backoff=${backoffMs}%dms]: $nThreads%d threads x $rounds%d rounds on one path " +
        f"in $secs%.1f s -> ${successes.get()}%d holds, ${refusals.get()}%d refusals, " +
        f"${errors.get()}%d errors, ${violations.get()}%d mutual-exclusion violations " +
        f"(raw local fs; the fence is documented HDFS-semantics-only — zero-backoff " +
        "continuous storms can livelock into all-refusals HERE because racing local " +
        "renames tear the lease's data/.crc pair; torn leases read as absent and " +
        "self-heal on the next settled claim, and HDFS renames cannot interleave)"
    )
    spark.stop()
  }

  /** Recursive relative-path → bytes snapshot of a directory tree:
    * the per-batch "bytes written" metric is the size sum of paths
    * present AFTER a batch that were absent before (moves/renames of
    * an existing file count once, at its original write — exactly the
    * I/O the policy argument is about).
    */
  private def fileSnapshot(root: java.io.File, prefix: String = ""): Map[String, Long] =
    if (!root.exists()) Map.empty
    else if (root.isFile) Map(prefix + root.getName -> root.length())
    else
      root.listFiles().flatMap(f => fileSnapshot(f, prefix + root.getName + "/")).toMap

  private def bytesWritten(before: Map[String, Long], after: Map[String, Long]): Long =
    after.collect { case (p, b) if !before.contains(p) => b }.sum

  /** `dedup <corpusParquetDir> [nBatches] [rowsPerBatch]` — the
    * hash-index WRITE-AMPLIFICATION A/B over a long crawl: run the
    * same batch sequence through `Maintenance.incrementalDedup` twice,
    * once with the size-TIERED self-compaction (maxIndexFiles = 8, the
    * shipping policy) and once simulating the full-rewrite policy
    * (compact() whenever the file count crosses the same threshold).
    * Per batch, bytes written into the index dir are snapshot-diffed;
    * reported in thirds so compaction triggers amortize. The claim
    * under test: tiered per-batch write volume stays FLAT as the index
    * grows (O(batch · log)), while full-rewrite GROWS with crawl age
    * (O(index/threshold)) — the r8 verdict's remaining `weak`.
    */
  private def dedup(corpusDir: String, nBatches: Int, rows: Int): Unit = {
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("dedup-tier").toString
    val docs = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    def run(index: String, tiered: Boolean): (Seq[Long], Seq[Double]) = {
      val stats = (1 to nBatches).map { i =>
        val b = docs
          .limit(rows)
          .select(
            (col("doc_id") + i.toLong * 10000000L).as("doc_id"),
            concat(col("text"), lit(s" batch-salt-$i")).as("text")
          )
        val dir = new java.io.File(index)
        val before = fileSnapshot(dir)
        val (_, t) = StressUtil.timed {
          if (tiered)
            graft.operators.Maintenance
              .incrementalDedup(spark, b, "doc_id", "text", index, maxIndexFiles = 8)
          else {
            graft.operators.Maintenance
              .incrementalDedup(spark, b, "doc_id", "text", index, maxIndexFiles = 0)
            val n = Option(dir.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
            if (n > 8) graft.operators.Maintenance.compact(spark, index)
          }
        }
        (bytesWritten(before, fileSnapshot(dir)), t)
      }
      (stats.map(_._1), stats.map(_._2))
    }
    def thirds(xs: Seq[Long]): String = {
      val k = xs.length / 3
      Seq(xs.take(k), xs.slice(k, 2 * k), xs.drop(2 * k))
        .map(w => f"${w.sum / math.max(w.length, 1) / 1024}%d KiB")
        .mkString(" / ")
    }
    val (tb, tt) = run(s"$root/tiered", tiered = true)
    val (fb, ft) = run(s"$root/full", tiered = false)
    println(
      s"[dedup-tier] $nBatches batches x $rows docs; per-batch index bytes written (thirds, early/mid/late):"
    )
    println(s"[dedup-tier]   tiered:       ${thirds(tb)} (flat = write volume independent of crawl age)")
    println(s"[dedup-tier]   full-rewrite: ${thirds(fb)} (grows with the index — the policy tiering replaces)")
    println(
      f"[dedup-tier]   totals: tiered ${tb.sum / 1024}%d KiB / ${tt.sum}%.1f s vs full ${fb.sum / 1024}%d KiB / ${ft.sum}%.1f s"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  /** `pack <corpusParquetDir> [nBatches] [rowsPerBatch]` — incremental
    * packing over a LONG crawl: backfill the corpus as batch 0, then
    * run 100+ small batches through `Packing.packIngest` (manifest
    * written batch-keyed, as the CLI does). The claim under test:
    * per-batch wall is FLAT as the pack space ages — the layout is
    * O(batch) and the offset-state read is a scan of tiny
    * one-row-per-batch files, never the manifests.
    */
  /** `epochs [nPacks] [epochs]` — the epoch-shuffle schedule at a
    * 100 TB-shaped pack count: the default 24M packs ≈ a ~50B-token
    * corpus at budget 2048. `Packing.epochOrder` reads only
    * `max(last_pack)` from its manifest, so a 1-row synthetic manifest
    * drives the real ranking path: nPacks × epochs md5 keys through
    * the two-pass bucket prefix (256 partitions/epoch, never a global
    * sort), schedule written to parquet. A second pass verifies each
    * epoch IS a permutation (count, bounds, exact distinct ords) — the
    * verification shuffle is timed separately so the production number
    * stands alone.
    */
  private def epochsStress(nPacks: Long, nEpochs: Int): Unit = {
    val spark = StressUtil.session()
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("epoch-stress").toString
    val man = Seq((0L, nPacks - 1)).toDF("doc_id", "last_pack")
    val (_, tProduce) = StressUtil.timed {
      graft.operators.Packing
        .epochOrder(man, nEpochs, "stress")
        .write
        .mode("overwrite")
        .parquet(s"$root/sched")
    }
    println(f"epochs: schedule ${nPacks}x$nEpochs produced+written in $tProduce%.1f s")
    val (ok, tVerify) = StressUtil.timed {
      spark.read
        .parquet(s"$root/sched")
        .groupBy(col("epoch"))
        .agg(
          count(lit(1)).as("n"),
          min(col("ord")).as("lo"),
          max(col("ord")).as("hi"),
          countDistinct(col("ord")).as("nd")
        )
        .collect()
        .forall(r =>
          r.getLong(1) == nPacks && r.getLong(2) == 0L &&
            r.getLong(3) == nPacks - 1 && r.getLong(4) == nPacks
        )
    }
    require(ok, "an epoch failed the permutation check")
    println(f"epochs: permutation verified (count/bounds/distinct) in $tVerify%.1f s")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  /** `resume [nPacks] [nEpochs]` — loader restart at corpus scale:
    * produce the nPacks × nEpochs schedule once (the epochs-mode
    * path), then time `Packing.resumeSlice` resuming at ~60% consumed
    * against the written schedule. The claim under test: restart cost
    * is one bounded per-epoch agg plus a filter scan of the schedule
    * parquet — no shuffle, no window — so it tracks the SCHEDULE's
    * size (epochs × nPacks rows of three longs), never the corpus,
    * and is the same at 1% or 99% consumed. Verified: slice row count
    * == total − consumed and min(global_ord) == consumed.
    */
  private def resumeStress(nPacks: Long, nEpochs: Int): Unit = {
    val spark = StressUtil.session()
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("resume-stress").toString
    val man = Seq((0L, nPacks - 1)).toDF("doc_id", "last_pack")
    val (_, tProduce) = StressUtil.timed {
      graft.operators.Packing
        .epochOrder(man, nEpochs, "stress")
        .write
        .mode("overwrite")
        .parquet(s"$root/sched")
    }
    println(f"resume: schedule ${nPacks}x$nEpochs produced+written in $tProduce%.1f s")
    val total = nPacks * nEpochs
    val batch = 512L
    val step = (total * 6L / 10L) / batch // ~60% consumed
    val consumed = step * batch
    val (stats, tSlice) = StressUtil.timed {
      graft.operators.Packing
        .resumeSlice(spark.read.parquet(s"$root/sched"), step, batch)
        .agg(count(lit(1)).as("n"), min(col("global_ord")).as("lo"))
        .head()
    }
    require(
      stats.getLong(0) == total - consumed && stats.getLong(1) == consumed,
      s"slice mismatch: n=${stats.getLong(0)} lo=${stats.getLong(1)} consumed=$consumed"
    )
    println(
      f"resume: slice at step $step%d (x$batch packs, ${100 * consumed / total}%d%% consumed) " +
        f"scanned+verified in $tSlice%.1f s — ${total - consumed}%d remaining rows"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  /** `provenance [nDocs] [nSources]` — the governance side-file at
    * corpus scale: a synthetic manifest with CLOSED-FORM offsets (per
    * doc, n_toks = 150 + id%100, so start_tok is pure arithmetic —
    * 150·id + (id/100)·4950 + (id%100)(id%100−1)/2 — and the stress
    * needs no window to lay the corpus out), budget 2048, sources
    * id%nSources. The claim under test: provenance cost is one
    * id-keyed join + one keyed agg over manifest-sized rows — it
    * tracks O(docs), never corpus text, and its token accounting is
    * exact and total at any size. Verified: Σ n_toks over the output
    * == the closed-form corpus total.
    */
  /** `pref [nResponses] [fanout]` — the preference-pair build and
    * best-of-n selection at RLHF-campaign scale: nResponses synthetic
    * scored responses in prompts of `fanout` (50M × 50 = 1M prompts
    * by default), scores a multiplicative-hash permutation so every
    * prompt's scores are distinct (consecutive ids are injective mod
    * the 1000003 prime when fanout < p) and exactly one strict-margin
    * pair exists per prompt. The claims under test: the pair build is
    * ONE map-side-combined agg whose cost tracks responses (not
    * prompts × responses), and the q148 window never sees a partition
    * larger than the fanout. Verified: pair count == nPrompts, min
    * margin > 0, best-of-4 count == 4 × nPrompts, and 1,000 sampled
    * prompts brute-forced on the driver from the score formula match
    * the operator's chosen/rejected/margin exactly.
    */
  private def prefStress(nResponses: Long, fanout: Int): Unit = {
    val spark = StressUtil.session()
    require(fanout >= 2 && fanout < 1000003, s"fanout in [2, 1000003), got $fanout")
    require(nResponses % fanout == 0, "nResponses must be a multiple of fanout")
    val nPrompts = nResponses / fanout
    def resp = spark
      .range(nResponses)
      .select(
        expr(s"id div $fanout").as("prompt_id"),
        col("id").as("doc_id"),
        expr("(id * 2654435761) % 1000003").as("score")
      )
    val (pairStats, tPairs) = StressUtil.timed {
      graft.operators.Preference
        .preferencePairs(resp, "prompt_id", "doc_id", "score")
        .agg(count(lit(1)), min(col("margin")))
        .head()
    }
    require(
      pairStats.getLong(0) == nPrompts && pairStats.getLong(1) > 0,
      s"pair contract broke: ${pairStats.getLong(0)} pairs (want $nPrompts), " +
        s"min margin ${pairStats.getLong(1)}"
    )
    val (bonCount, tBon) = StressUtil.timed {
      graft.operators.Preference
        .bestOfN(resp, "prompt_id", "doc_id", "score", n = 4)
        .count()
    }
    require(
      bonCount == 4L * nPrompts,
      s"best-of-4 count broke: $bonCount != ${4L * nPrompts}"
    )
    // 1,000 sampled prompts brute-forced on the driver from the formula.
    def score(id: Long): Long = (id * 2654435761L) % 1000003L
    val sample = (0L until 1000L).map(i => (i * 104729L) % nPrompts).distinct
    val got = graft.operators.Preference
      .preferencePairs(
        resp.filter(col("prompt_id").isin(sample: _*)),
        "prompt_id",
        "doc_id",
        "score"
      )
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    sample.foreach { p =>
      val ids = (p * fanout) until (p * fanout + fanout)
      val chosen = ids.minBy(id => (-score(id), id))
      val rejected = ids.minBy(id => (score(id), id))
      val want = (chosen, rejected, score(chosen) - score(rejected))
      require(got(p) == want, s"prompt $p: ${got(p)} != $want")
    }
    println(
      f"pref: $nResponses%d responses x $nPrompts%d prompts — pairs in $tPairs%.1f s, " +
        f"best-of-4 in $tBon%.1f s; counts/margins exact, 1000 sampled pairs brute-force-matched"
    )
  }

  /** `sft [nTurns] [turnsPerConv] [toksPerTurn]` — the one-command
    * SFT release at campaign scale: nTurns synthetic turns (roles
    * alternating, content from a bounded shared token space so the
    * vocab stays realistic) driven through `sft_release` end to end
    * (render → pack_ingest → sft_masks → build_vocab → pack_export →
    * mask sidecar). Verified from the LANDED artifacts: the audit's
    * masked-token count equals the closed-form assistant total
    * (toksPerTurn × assistant turns), and landed packs equal the
    * manifest's pack count.
    */
  private def sftStress(nTurns: Long, turnsPerConv: Int, toksPerTurn: Int): Unit = {
    val spark = StressUtil.session()
    // The 2M-turn point exhausts this sandbox's shared 4 GiB JVM in
    // the export's pack-array aggregation (32 threads split ~2.4 GiB
    // of execution memory); finer scan splits were tried and slow the
    // passing points ~60% without saving it — an executor-memory
    // ceiling of the harness, documented in SCALE.md, not worked
    // around here.
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of turnsPerConv")
    val root = java.nio.file.Files.createTempDirectory("graft-sft-stress").toString
    val toks = (0 until toksPerTurn)
      .map(j => s"concat('t', (id * 31 + $j) % 50000)")
      .mkString(", ' ', ")
    spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        col("id").as("turn_key"),
        when(col("id") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        expr(s"concat($toks)").as("content")
      )
      .write
      .parquet(s"$root/turns")
    val (_, t) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(
        Array(
          "--maintenance", "sft_release",
          "--turns", s"$root/turns", "--out", s"$root/rel",
          "--budget", "2048", "--shards", "16", "--export_shards", "16"
        ),
        spark
      )
    }
    val audit = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/rel/_sft_release.json")),
      "UTF-8"
    )
    // roles alternate on the GLOBAL turn id; with an even turnsPerConv
    // every conversation holds exactly half assistant turns.
    require(turnsPerConv % 2 == 0, "use an even turnsPerConv for the closed-form check")
    val wantMasked = toksPerTurn.toLong * (nTurns / 2)
    require(
      audit.contains(s""""masked_tokens": $wantMasked"""),
      s"masked-token audit diverged from closed form $wantMasked: $audit"
    )
    val landed = spark.read.parquet(s"$root/rel/shards").count()
    val man = spark.read.parquet(s"$root/rel/manifests")
    val nPacks = man.agg(max(col("last_pack"))).head().getLong(0) + 1
    require(landed == nPacks, s"landed $landed != manifest packs $nPacks")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"sft: $nTurns%d turns (${nTurns / turnsPerConv}%d convs, ${toksPerTurn * nTurns}%d tokens) " +
        f"released end-to-end in $t%.1f s — $nPacks%d packs landed, " +
        f"masked tokens == closed form ($wantMasked%d)"
    )
  }

  /** `dpo [nTurns] [toksPerTurn]` — the `dpo_release` capstone
    * composed end to end at tree-corpus scale: the branch_render
    * corpus (q172 shape, per-conversation ids, collision-free
    * scores) plus a planted verdict table flagging BOTH assistant
    * children of parent t=6 in every 1000th conversation — listing
    * both members makes the purge count EXACT regardless of which
    * sibling won (any-member contract): exactly one of the
    * conversation's two pairs purges. Verified from the landing:
    * landed rows == 2·convs − flagged, the audit's purged count
    * exact, and verify_export green (it runs inside the capstone by
    * default).
    */
  private def dpoReleaseStress(nTurns: Long, toksPerTurn: Int): Unit = {
    val spark = StressUtil.session()
    val turnsPerConv = 20
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of 20")
    val nConvs = nTurns / turnsPerConv
    val root = java.nio.file.Files.createTempDirectory("graft-dpo-stress").toString
    val toks = (0 until toksPerTurn)
      .map(j => s"concat('t', (id * 31 + $j) % 50000)")
      .mkString(", ' ', ")
    val t = s"(id % $turnsPerConv)"
    spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id"),
        when(col("id") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        expr(s"concat($toks)").as("content"),
        expr("id % 1000003").as("score")
      )
      .write
      .parquet(s"$root/turns")
    val nFlagged = (nConvs + 999) / 1000
    spark
      .range(nConvs)
      .filter(col("id") % 1000 === 0)
      .selectExpr("id AS conv_id", "explode(array(7L, 9L)) AS turn_id")
      .write
      .parquet(s"$root/bad")
    val (_, tRel) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(
        Array(
          "--maintenance", "dpo_release", "--turns", s"$root/turns",
          "--out", s"$root/rel", "--bad", s"$root/bad", "--shards", "16"
        ),
        spark
      )
    }
    val landed = spark.read.parquet(s"$root/rel/shards").count()
    require(
      landed == 2 * nConvs - nFlagged,
      s"landed $landed != ${2 * nConvs - nFlagged} (2·convs − flagged)"
    )
    val audit = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/rel/_dpo_release.json")),
      "UTF-8"
    )
    require(audit.contains(s""""purged": $nFlagged"""), s"audit purge count diverged: $audit")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"dpo: $nTurns%d turns ($nConvs%d convs) -> ${2 * nConvs}%d triples, $nFlagged%d purged, " +
        f"$landed%d landed + verified in $tRel%.1f s end-to-end"
    )
  }

  /** `turns_stream [nTurns]` — the tree family's STREAMING arm at
    * store scale: the q172-shaped 2M-turn corpus lands as three
    * causal turn-batch JSON waves (per-conv offsets 0-9, 10-14,
    * 15-19 — every wave carries leaf extensions, in-batch chains,
    * and regeneration forks onto earlier waves), each drained by the
    * `turns_stream` verb into the segmented TreeState via its own
    * AvailableNow run (foreachBatch batchId = the applied id).
    * Verified from the state: total membership rows equal the
    * per-conversation closed form × conversations (every conv is
    * isomorphic), and the first 50 conversations replay exactly
    * against a from-scratch treePaths walk.
    */
  private def turnsStreamStress(nTurns: Long): Unit = {
    val spark = StressUtil.session()
    val turnsPerConv = 20
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of 20")
    val nConvs = nTurns / turnsPerConv
    val root = java.nio.file.Files.createTempDirectory("graft-turns-stream-stress").toString
    new java.io.File(s"$root/raw").mkdirs()
    val t = s"(id % $turnsPerConv)"
    val store = spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id")
      )
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var total = 0.0
    Seq((0, 10), (10, 15), (15, 20)).zipWithIndex.foreach { case ((lo, hi), i) =>
      store
        .filter(col("turn_id") >= lo && col("turn_id") < hi)
        .coalesce(1) // one file per wave: the verb's file-=-turn-batch contract
        .write
        .json(s"$root/json$i")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/json$i"))
        .filter(_.getPath.getName.endsWith(".json"))
        .zipWithIndex
        .foreach { case (st, j) =>
          fs.rename(st.getPath, new org.apache.hadoop.fs.Path(s"$root/raw/b$i-$j.json"))
        }
      val (_, tD) = StressUtil.timed {
        graft.pipeline.PipelineRunner.run(
          Array(
            "--maintenance", "turns_stream", "--raw", s"$root/raw",
            "--state", s"$root/tree", "--checkpoint", s"$root/ckpt"
          ),
          spark
        )
      }
      total += tD
      println(f"turns_stream: wave $i drained in $tD%.1f s")
    }
    val memb = graft.operators.TreeState.memberships(spark, s"$root/tree")
    val perConv = graft.operators.ConvTree
      .treePaths(store.filter(col("conv_id") === 0L), "conv_id", "turn_id", "parent_id")
      .count()
    val got = memb.count()
    require(
      got == perConv * nConvs,
      s"state holds $got membership rows != $perConv x $nConvs (the per-conv closed form)"
    )
    val sample = memb.filter(col("conv_id") < 50L).collect().map(_.toSeq).toSet
    val want = graft.operators.ConvTree
      .treePaths(store.filter(col("conv_id") < 50L), "conv_id", "turn_id", "parent_id")
      .collect().map(_.toSeq).toSet
    require(sample == want, "sampled conversations diverge from the from-scratch walk")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"turns_stream: $nTurns%d turns ($nConvs%d convs) streamed in 3 causal waves -> " +
        f"$got%d membership rows in the segmented state, $total%.1f s total drain time"
    )
  }

  /** `turns_backfill [nTurns] [nFiles]` — the cold-start arm's scale
    * claim, measured: a backlog of `nFiles` accumulated turn files
    * costs ONE fold through `turns_backfill` vs `nFiles` serial
    * per-file folds through steady-state `turns_stream` (the
    * file-=-batch contract's per-fold floor × N). Files carry disjoint
    * complete conversations (a backlog of landed conversation shards —
    * causal by construction). Both arms are verified against the
    * per-conversation closed form; the backfill arm additionally
    * proves the handoff: one post-backfill file drains through
    * turns_stream on the SAME checkpoint (applied id advances by one,
    * counts stay exact).
    */
  private def turnsBackfillStress(nTurns: Long, nFiles: Int): Unit = {
    val spark = StressUtil.session()
    val turnsPerConv = 20
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of 20")
    val nConvs = nTurns / turnsPerConv
    require(nConvs % nFiles == 0, "nConvs must divide evenly into nFiles")
    val convsPerFile = nConvs / nFiles
    val root = java.nio.file.Files.createTempDirectory("graft-turns-backfill-stress").toString
    val t = s"(id % $turnsPerConv)"
    val store = spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id")
      )
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeBacklog(raw: String): Unit = {
      new java.io.File(raw).mkdirs()
      // one json file per conv range — whole conversations per file
      store
        .withColumn("__f", expr(s"conv_id div $convsPerFile"))
        .repartition(nFiles, col("__f"))
        .sortWithinPartitions(col("__f"))
        .write
        .partitionBy("__f")
        .json(s"$root/json")
      (0 until nFiles).foreach { f =>
        val dir = new org.apache.hadoop.fs.Path(s"$root/json/__f=$f")
        fs.listStatus(dir)
          .filter(_.getPath.getName.endsWith(".json"))
          .zipWithIndex
          .foreach { case (st, j) =>
            fs.rename(st.getPath, new org.apache.hadoop.fs.Path(f"$raw/b$f%04d-$j.json"))
          }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$root/json"))
    }
    val perConv = graft.operators.ConvTree
      .treePaths(store.filter(col("conv_id") === 0L), "conv_id", "turn_id", "parent_id")
      .count()
    // ── arm A: backfill — whole backlog, ONE fold ──────────────────
    writeBacklog(s"$root/rawA")
    val (_, tA) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "turns_backfill", "--raw", s"$root/rawA",
        "--state", s"$root/treeA", "--checkpoint", s"$root/ckptA"), spark)
    }
    val gotA = graft.operators.TreeState.memberships(spark, s"$root/treeA").count()
    require(gotA == perConv * nConvs, s"backfill state holds $gotA != $perConv x $nConvs")
    // ── crash window: fold committed, checkpoint NOT (r16) ─────────
    // The campaign-scale risk the happy-path spec can't see: a crash
    // AFTER the backlog fold lands its _applied_id but BEFORE the
    // stream's commit log records batch 0. On restart AvailableNow
    // replays the whole backlog as batch 0 from the offsets log —
    // simulated exactly by deleting commits/0 — and the fold's marker
    // must make that replay a no-op at full backlog scale: state
    // row-identical, nothing double-folded. Snapshot the state, delete
    // the commit record, re-drain, and diff.
    val preCrash = graft.operators.TreeState
      .memberships(spark, s"$root/treeA")
      .localCheckpoint()
    val commit0 = new org.apache.hadoop.fs.Path(s"$root/ckptA/commits/0")
    require(fs.exists(commit0), s"expected the backfill's commit record at $commit0")
    require(fs.delete(commit0, false), s"cannot delete $commit0")
    val (_, tReplay) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "turns_backfill", "--raw", s"$root/rawA",
        "--state", s"$root/treeA", "--checkpoint", s"$root/ckptA"), spark)
    }
    val postCrash = graft.operators.TreeState.memberships(spark, s"$root/treeA")
    require(postCrash.count() == gotA, s"replay changed the row count: ${postCrash.count()} != $gotA")
    require(
      postCrash.exceptAll(preCrash).isEmpty && preCrash.exceptAll(postCrash).isEmpty,
      "replayed backfill batch must be row-identical to the pre-crash state")
    println(f"turns_backfill crash-window replay (fold committed, checkpoint not): " +
      f"no-op converged in $tReplay%.1f s, state row-identical ($gotA%d rows)")
    // handoff: one NEW file through steady-state turns_stream on the
    // same checkpoint — nothing lost, nothing double-folded
    val extraConv = nConvs // a fresh conversation id past the backlog
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/rawA/z-extra.json"),
      s"""{"conv_id":$extraConv,"turn_id":0,"parent_id":null}""")
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "turns_stream", "--raw", s"$root/rawA",
      "--state", s"$root/treeA", "--checkpoint", s"$root/ckptA"), spark)
    val gotA2 = graft.operators.TreeState.memberships(spark, s"$root/treeA").count()
    require(gotA2 == perConv * nConvs + 1, s"handoff state holds $gotA2 != ${perConv * nConvs + 1}")
    // ── arm B: steady-state — nFiles serial per-file folds ─────────
    writeBacklog(s"$root/rawB")
    val (_, tB) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "turns_stream", "--raw", s"$root/rawB",
        "--state", s"$root/treeB", "--checkpoint", s"$root/ckptB"), spark)
    }
    val gotB = graft.operators.TreeState.memberships(spark, s"$root/treeB").count()
    require(gotB == perConv * nConvs, s"per-file state holds $gotB != $perConv x $nConvs")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"turns_backfill: $nTurns%d turns / $nFiles%d-file backlog -> backfill $tA%.1f s " +
        f"(ONE fold + verified handoff) vs per-file turns_stream $tB%.1f s " +
        f"(${tB / tA}%.1fx); both states equal the closed form ($gotA%d rows)"
    )
  }

  /** `tree_state [nTurns] [batchConvs] [buckets]` — the segmented
    * tree-membership state's scale claim, measured: fold cost follows
    * the BATCH's conversation set, not the store. Builds a large
    * branched store (q172 shape) as fold 0, then appends a SMALL
    * leaf-extension batch (5 turns onto each of `batchConvs`
    * conversations) and times it against the identical batch folded
    * into a SMALL store holding only those conversations — under the
    * old full-rewrite posture the big-store fold would pay an
    * O(store) read+write; under conv-hash bucketing both folds read
    * and rewrite only the touched buckets, so the two times should
    * sit within metadata noise of each other. Correctness: the
    * touched conversations' post-fold memberships must equal a
    * from-scratch treePaths replay over their full turn sets.
    */
  private def treeStateStress(nTurns: Long, batchConvs: Int, buckets: Int): Unit = {
    val spark = StressUtil.session()
    val turnsPerConv = 20
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of 20")
    val nConvs = nTurns / turnsPerConv
    require(batchConvs > 0 && batchConvs < nConvs, "batchConvs must be < nConvs")
    val root = java.nio.file.Files.createTempDirectory("graft-tree-state-stress").toString
    val t = s"(id % $turnsPerConv)"
    val store = spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id")
      )
    val (_, tBase) = StressUtil.timed {
      graft.operators.TreeState.fold(
        spark, store, "conv_id", "turn_id", "parent_id",
        s"$root/big", Some(0L), 10000, buckets)
    }
    // the small append: 5 chain turns extending each touched conv's
    // deepest leaf (19) — the path-REPLACE branch, the expensive one
    def appendBatch = spark
      .range(batchConvs.toLong * 5L)
      .select(
        expr("id div 5").as("conv_id"),
        expr(s"$turnsPerConv + (id % 5)").as("turn_id"),
        expr(s"$turnsPerConv + (id % 5) - 1").as("parent_id")
      )
    val (_, tBig) = StressUtil.timed {
      graft.operators.TreeState.fold(
        spark, appendBatch, "conv_id", "turn_id", "parent_id",
        s"$root/big", Some(1L), 10000, buckets)
    }
    // control: the same batch into a store of ONLY the touched convs
    graft.operators.TreeState.fold(
      spark, store.filter(col("conv_id") < batchConvs),
      "conv_id", "turn_id", "parent_id", s"$root/small", Some(0L), 10000, buckets)
    val (_, tSmall) = StressUtil.timed {
      graft.operators.TreeState.fold(
        spark, appendBatch, "conv_id", "turn_id", "parent_id",
        s"$root/small", Some(1L), 10000, buckets)
    }
    // correctness on the touched conversations: state == replay
    val gotTouched = graft.operators.TreeState
      .memberships(spark, s"$root/big")
      .filter(col("conv_id") < batchConvs)
      .collect().map(_.toSeq).toSet
    val want = graft.operators.ConvTree
      .treePaths(
        store.filter(col("conv_id") < batchConvs).unionByName(appendBatch),
        "conv_id", "turn_id", "parent_id")
      .collect().map(_.toSeq).toSet
    require(gotTouched == want, "touched convs' memberships diverge from the replay")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"tree_state: store build $nTurns%d turns ($nConvs%d convs, $buckets%d buckets) " +
        f"in $tBase%.1f s; append of ${batchConvs * 5}%d turns onto the ${nConvs}%d-conv " +
        f"store: $tBig%.1f s vs $tSmall%.1f s on a $batchConvs%d-conv store " +
        f"(ratio ${tBig / tSmall}%.2f — fold cost follows the batch, not the store)"
    )
  }

  /** `dpo_full [nTurns] [toksPerTurn]` — the ROUND-13 capstone shape:
    * `dpo_release` with ALL the arms on at tree-corpus scale —
    * `--bpe_model` (frozen 8-merge table built from a bounded sample
    * of the store; every landed triple carries prompt/chosen/rejected
    * model-token coordinates and the manifest pins the version +
    * per-side length-bias slopes), `--bad` (the keyed verdict plant
    * from the `dpo` arm: both assistant children of parent 6 in every
    * conv ≡ 0 mod 1000), and `--eval` (content decontam: turn 7 of
    * every conv ≡ 500 mod 1000 carries a conv-unique sentinel text
    * that the eval table holds verbatim — containment 1.0 in exactly
    * that pair's chosen-or-rejected member, and the two plants are
    * DISJOINT so purged_bad and purged_eval are both exact).
    * Verified from the landing: landed == 2·convs − bad − eval, both
    * audit counts exact, the version pin present, and a 5-row sample
    * of landed token coordinates recomputed through the library under
    * the same frozen model.
    */
  private def dpoFullStress(nTurns: Long, toksPerTurn: Int): Unit = {
    val spark = StressUtil.session()
    val turnsPerConv = 20
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of 20")
    require(toksPerTurn >= 3, "members need >= 3 tokens to shingle")
    val nConvs = nTurns / turnsPerConv
    require(nConvs % 1000 == 0, "nConvs must be a multiple of 1000 for exact plant counts")
    val root = java.nio.file.Files.createTempDirectory("graft-dpo-full").toString
    val toks = (0 until toksPerTurn)
      .map(j => s"concat('t', (id * 31 + $j) % 50000)")
      .mkString(", ' ', ")
    val t = s"(id % $turnsPerConv)"
    val sentinel =
      "concat('ev', conv_id, 'a ev', conv_id, 'b ev', conv_id, 'c ev', conv_id, 'd')"
    spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id"),
        when(col("id") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        expr(s"concat($toks)").as("content"),
        expr("id % 1000003").as("score")
      )
      .withColumn(
        "content",
        expr(
          s"CASE WHEN conv_id % 1000 = 500 AND turn_id = 7 THEN $sentinel ELSE content END"
        )
      )
      .write
      .parquet(s"$root/turns")
    val nBad = nConvs / 1000
    val nEval = nConvs / 1000 // convs ≡ 500 mod 1000
    spark
      .range(nConvs)
      .filter(col("id") % 1000 === 0)
      .selectExpr("id AS conv_id", "explode(array(7L, 9L)) AS turn_id")
      .write
      .parquet(s"$root/bad")
    spark
      .range(nConvs)
      .filter(col("id") % 1000 === 500)
      .selectExpr("id AS conv_id", sentinel.replace("conv_id", "id") + " AS text")
      .write
      .parquet(s"$root/eval")
    // frozen tokenizer from a bounded sample — the serving posture
    // (the release must not retrain; the sample bound keeps the model
    // build O(sample), never O(store))
    graft.operators.Bpe.buildModel(
      spark,
      spark.read.parquet(s"$root/turns").limit(20000).select(col("content")),
      "content",
      s"$root/model",
      numMerges = 8
    )
    val (_, tRel) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(
        Array(
          "--maintenance", "dpo_release", "--turns", s"$root/turns",
          "--out", s"$root/rel", "--shards", "16",
          "--bpe_model", s"$root/model", "--length_batches", "64",
          "--bad", s"$root/bad", "--eval", s"$root/eval"
        ),
        spark
      )
    }
    val landed = spark.read.parquet(s"$root/rel/shards")
    val nLanded = landed.count()
    require(
      nLanded == 2 * nConvs - nBad - nEval,
      s"landed $nLanded != ${2 * nConvs - nBad - nEval} (2·convs − bad − eval)"
    )
    val audit = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/rel/_dpo_release.json")),
      "UTF-8"
    )
    require(
      audit.contains(s""""purged_bad": $nBad""") &&
        audit.contains(s""""purged_eval": $nEval""") &&
        audit.contains(""""bpe_model_version": 1""") &&
        audit.contains(""""length_bias_slope_micro""""),
      s"audit diverged: $audit"
    )
    // the batch manifest covers every landed pair exactly once
    val batchRows = spark.read.parquet(s"$root/rel/batches")
    require(
      batchRows.count() == nLanded &&
        batchRows.select("conv_id", "parent_id").distinct().count() == nLanded,
      "batch manifest must assign every landed pair exactly once"
    )
    // landed coordinates == the library computation under the same
    // frozen model, on a bounded sample
    val merges = graft.operators.Bpe.loadMerges(spark, s"$root/model")
    val sample = landed
      .select("prompt", "chosen", "rejected", "prompt_toks", "chosen_toks", "rejected_toks")
      .limit(5)
      .collect()
    val redo = graft.operators.Bpe
      .withModelTokenCounts(
        spark.createDataFrame(
          spark.sparkContext.parallelize(sample.toSeq.map(r =>
            org.apache.spark.sql.Row(r.getString(0), r.getString(1), r.getString(2)))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("prompt", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("chosen", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("rejected", org.apache.spark.sql.types.StringType)
          ))
        ),
        Seq("prompt", "chosen", "rejected"),
        merges
      )
      .collect()
      .map(r => (r.getString(0), (r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    sample.foreach { r =>
      val want = (r.getLong(3), r.getLong(4), r.getLong(5))
      require(
        redo(r.getString(0)) == want,
        s"landed token coordinates diverge from the library under the frozen model: $want vs ${redo(r.getString(0))}"
      )
    }
    // STATE-SERVED variant (the full r12→r13 arc, end-to-end at store
    // scale): fold the store's STRUCTURE into the segmented TreeState
    // in the 3 causal waves the turns_stream arm drains, then run the
    // SAME all-arms release with `--paths_state` — the prompt renders
    // read the persisted memberships instead of re-walking the store.
    // The landing must be row-identical to the from-scratch release.
    val (_, tFold) = StressUtil.timed {
      Seq((0, 10), (10, 15), (15, 20)).zipWithIndex.foreach { case ((lo, hi), i) =>
        graft.operators.TreeState.fold(
          spark,
          spark.read.parquet(s"$root/turns")
            .filter(col("turn_id") >= lo && col("turn_id") < hi)
            .select(col("conv_id"), col("turn_id"), col("parent_id")),
          "conv_id", "turn_id", "parent_id", s"$root/tree", Some(i.toLong), 10000, 256)
      }
    }
    val (_, tRel2) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(
        Array(
          "--maintenance", "dpo_release", "--turns", s"$root/turns",
          "--out", s"$root/rel2", "--shards", "16",
          "--bpe_model", s"$root/model", "--length_batches", "64",
          "--bad", s"$root/bad", "--eval", s"$root/eval",
          "--paths_state", s"$root/tree"
        ),
        spark
      )
    }
    val landed2 = spark.read.parquet(s"$root/rel2/shards")
    val keyCols = Seq("conv_id", "parent_id", "prompt", "chosen", "rejected",
      "prompt_toks", "chosen_toks", "rejected_toks").map(col)
    require(
      landed2.count() == nLanded &&
        landed.select(keyCols: _*).exceptAll(landed2.select(keyCols: _*)).isEmpty &&
        landed2.select(keyCols: _*).exceptAll(landed.select(keyCols: _*)).isEmpty,
      "state-served release diverges from the from-scratch release"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"dpo_full: $nTurns%d turns ($nConvs%d convs) -> ${2 * nConvs}%d triples, " +
        f"$nBad%d bad-purged + $nEval%d eval-purged, $nLanded%d landed with model-token " +
        f"coordinates + verified in $tRel%.1f s end-to-end from scratch; state-served " +
        f"arc: 3 structure folds $tFold%.1f s + all-arms release $tRel2%.1f s, " +
        f"landing row-identical"
    )
  }

  /** `branch_render [nTurns] [turnsPerConv] [toksPerTurn]` — the
    * rendered-DPO-triples export (q178's operator, `branch_pairs
    * --render`) at tree-corpus scale: the q172 branched shape with
    * PER-CONVERSATION turn ids and collision-free scores
    * (`global_id mod 1000003` — sibling ids differ by 2, so sibling
    * scores can never tie and the pair count is EXACT). Verified from
    * the landed triples: exactly 2 pairs per conversation (parents
    * t=6 and t=16 are the only ones with two assistant children in
    * the 20-turn shape), every margin positive, and the prompt
    * lengths take exactly the two closed-form values — 5·toksPerTurn
    * words for the t=6 parent (path 0,1,4,5,6) and 11·toksPerTurn for
    * t=16 (path 0,1,4,5,6,9,10,11,14,15,16) — which proves the
    * root→parent renders follow the regeneration pointers, not the
    * id order.
    */
  private def branchRenderStress(nTurns: Long, turnsPerConv: Int, toksPerTurn: Int): Unit = {
    val spark = StressUtil.session()
    require(turnsPerConv == 20, "the closed-form path lengths assume the 20-turn q172 shape")
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of turnsPerConv")
    val root = java.nio.file.Files.createTempDirectory("graft-branch-render").toString
    val toks = (0 until toksPerTurn)
      .map(j => s"concat('t', (id * 31 + $j) % 50000)")
      .mkString(", ' ', ")
    val t = s"(id % $turnsPerConv)"
    spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id"),
        when(col("id") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        expr(s"concat($toks)").as("content"),
        expr("id % 1000003").as("score")
      )
      .write
      .parquet(s"$root/turns")
    val (_, tR) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(
        Array(
          "--maintenance", "branch_pairs", "--turns", s"$root/turns",
          "--out", s"$root/triples", "--render", "true"
        ),
        spark
      )
    }
    val nConvs = nTurns / turnsPerConv
    val triples = spark.read.parquet(s"$root/triples")
    val audit = triples
      .agg(
        count(lit(1)).as("n"),
        min(col("margin")).as("min_margin"),
        countDistinct(expr("size(split(prompt, ' '))")).as("n_plens"),
        min(expr("size(split(prompt, ' '))")).as("plen_lo"),
        max(expr("size(split(prompt, ' '))")).as("plen_hi")
      )
      .head()
    require(audit.getLong(0) == 2 * nConvs, s"expected ${2 * nConvs} pairs, got ${audit.getLong(0)}")
    require(audit.getLong(1) > 0, "a non-positive margin escaped the filter")
    require(
      audit.getLong(2) == 2 && audit.getInt(3) == 5 * toksPerTurn && audit.getInt(4) == 11 * toksPerTurn,
      s"prompt lengths diverge from the closed-form {${5 * toksPerTurn}, ${11 * toksPerTurn}}: " +
        s"${audit.getInt(3)}..${audit.getInt(4)} over ${audit.getLong(2)} classes"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"branch_render: $nTurns%d turns ($nConvs%d convs) -> ${2 * nConvs}%d rendered DPO " +
        f"triples in $tR%.1f s; margins positive, prompt lengths exactly " +
        f"{${5 * toksPerTurn}%d, ${11 * toksPerTurn}%d} words"
    )
  }

  /** `sft_tree [nTurns] [turnsPerConv] [toksPerTurn]` — the TREE-mode
    * SFT release at campaign scale: branched conversations in the
    * q172 shape (every 5th turn regenerates from three turns back →
    * multiple leaves per conversation, shared prefixes) with
    * PER-CONVERSATION-RESTARTING turn ids — the storage shape the
    * conv-keyed closure exists for — driven through
    * `sft_release --parent_col` end to end. The verification IS the
    * single-loss invariant: the audit's masked-token count must equal
    * the closed-form assistant total `toksPerTurn × nTurns/2` — the
    * SAME number as flat mode, fan-out notwithstanding (every turn
    * trains exactly once; the membership table grows with paths, the
    * loss-on set does not) — and the path count must equal the
    * closed-form leaves-per-conversation × conversations.
    */
  private def sftTreeStress(nTurns: Long, turnsPerConv: Int, toksPerTurn: Int): Unit = {
    val spark = StressUtil.session()
    require(nTurns % turnsPerConv == 0, "nTurns must be a multiple of turnsPerConv")
    require(turnsPerConv % 2 == 0, "use an even turnsPerConv for the closed-form check")
    val root = java.nio.file.Files.createTempDirectory("graft-sft-tree-stress").toString
    val toks = (0 until toksPerTurn)
      .map(j => s"concat('t', (id * 31 + $j) % 50000)")
      .mkString(", ' ', ")
    val t = s"(id % $turnsPerConv)"
    spark
      .range(nTurns)
      .select(
        expr(s"id div $turnsPerConv").as("conv_id"),
        expr(t).as("turn_id"),
        expr(
          s"CASE WHEN $t = 0 THEN CAST(NULL AS BIGINT) " +
            s"WHEN $t % 5 = 4 THEN $t - 3 ELSE $t - 1 END"
        ).as("parent_id"),
        when(col("id") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        expr(s"concat($toks)").as("content")
      )
      .write
      .parquet(s"$root/turns")
    val (_, tRel) = StressUtil.timed {
      graft.pipeline.PipelineRunner.run(
        Array(
          "--maintenance", "sft_release",
          "--turns", s"$root/turns", "--out", s"$root/rel",
          "--parent_col", "parent_id", "--turn_col", "turn_id",
          "--budget", "2048", "--shards", "16", "--export_shards", "16"
        ),
        spark
      )
    }
    val audit = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/rel/_sft_release.json")),
      "UTF-8"
    )
    // single-loss invariant: masked == the FLAT closed form
    val wantMasked = toksPerTurn.toLong * (nTurns / 2)
    require(
      audit.contains(s""""masked_tokens": $wantMasked"""),
      s"tree release masked-token audit diverged from the single-loss closed form $wantMasked: $audit"
    )
    // closed-form path count: leaves per conversation × conversations
    val parents = (1 until turnsPerConv).map(x => if (x % 5 == 4) x - 3 else x - 1).toSet
    val leavesPerConv = turnsPerConv - parents.size
    val wantPaths = leavesPerConv.toLong * (nTurns / turnsPerConv)
    require(
      audit.contains(s""""paths": $wantPaths"""),
      s"path count diverged from closed form $wantPaths ($leavesPerConv leaves/conv): $audit"
    )
    val landed = spark.read.parquet(s"$root/rel/shards").count()
    val man = spark.read.parquet(s"$root/rel/manifests")
    val nPacks = man.agg(max(col("last_pack"))).head().getLong(0) + 1
    require(landed == nPacks, s"landed $landed != manifest packs $nPacks")
    val memberships = spark.read.parquet(s"$root/rel/path_turns").count()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"sft_tree: $nTurns%d turns (${nTurns / turnsPerConv}%d convs, $wantPaths%d paths, " +
        f"$memberships%d path-turn memberships) released end-to-end in $tRel%.1f s — " +
        f"$nPacks%d packs, masked tokens == the FLAT closed form ($wantMasked%d): " +
        "fan-out did not move the loss-on set"
    )
  }

  /** `pref_ingest [nBatches] [batchRows] [fanout]` — the incremental
    * pair state over a long RLHF campaign: every batch delivers
    * `batchRows` fresh responses spread over the SAME
    * `batchRows / fanout` prompts (the steady-state shape — new
    * samples for existing prompts), folded via
    * `Preference.pairIngest`. The claim under test: per-batch wall
    * windows stay FLAT as responses accumulate (the fold touches the
    * batch and the O(prompts) state, never history). Verified: the
    * final state's pair table equals the ONE-SHOT `preferencePairs`
    * over all nBatches × batchRows responses, exactly (both-ways
    * except), and per-batch thirds are printed for the flatness read.
    */
  private def prefIngestStress(nBatches: Int, batchRows: Long, fanout: Int): Unit = {
    val spark = StressUtil.session()
    require(batchRows % fanout == 0, "batchRows must be a multiple of fanout")
    val nPrompts = batchRows / fanout
    val root = java.nio.file.Files.createTempDirectory("graft-pref-ingest-stress").toString
    val state = s"$root/state"
    def batch(b: Int) = spark
      .range(b * batchRows, (b + 1) * batchRows)
      .select(
        (col("id") % nPrompts).as("prompt_id"),
        col("id").as("doc_id"),
        expr("(id * 2654435761) % 1000003").as("score")
      )
    val times = (0 until nBatches).map { b =>
      val (_, t) = StressUtil.timed {
        graft.operators.Preference
          .pairIngest(spark, batch(b), "prompt_id", "doc_id", "score", state, Some(b.toLong))
      }
      t
    }
    val thirds = times.grouped(math.max(1, nBatches / 3)).map(_.sum).toSeq
    val all = spark
      .range(nBatches * batchRows)
      .select(
        (col("id") % nPrompts).as("prompt_id"),
        col("id").as("doc_id"),
        expr("(id * 2654435761) % 1000003").as("score")
      )
    val oneShot = graft.operators.Preference
      .preferencePairs(all, "prompt_id", "doc_id", "score")
    val fromState = graft.operators.Preference.pairsFromState(spark, state)
    require(
      fromState.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fromState).isEmpty,
      "incremental state diverged from the one-shot pair table"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    println(
      f"pref_ingest: $nBatches%d batches x $batchRows%d responses over $nPrompts%d prompts — " +
        f"per-batch thirds ${thirds.map(t => f"$t%.1f").mkString("/")} s " +
        f"(total ${times.sum}%.1f s), final state == one-shot pair table exactly"
    )
  }

  private def provenanceStress(nDocs: Long, nSources: Int): Unit = {
    val spark = StressUtil.session()
    val budget = 2048L
    // start(id) = 150·id + (id div 100)·4950 + (id%100)(id%100−1)/2
    val start = expr(
      "150 * id + (id div 100) * 4950 + ((id % 100) * ((id % 100) - 1)) div 2"
    )
    val man = spark
      .range(nDocs)
      .withColumn("n_toks", expr("150 + id % 100"))
      .withColumn("start_tok", start)
      .withColumn("first_pack", expr(s"start_tok div $budget"))
      .withColumn("last_pack", expr(s"(start_tok + n_toks - 1) div $budget"))
      .withColumnRenamed("id", "doc_id")
    val attrs = spark
      .range(nDocs)
      .select(col("id").as("doc_id"), concat(lit("s"), col("id") % nSources).as("source"))
    val ((rows, toks), t) = StressUtil.timed {
      val r = graft.operators.Packing
        .provenance(man, attrs, "doc_id", budget, Seq("source"))
        .agg(count(lit(1)), sum(col("n_toks")))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val r = nDocs % 100
    val wantToks = 150L * nDocs + (nDocs / 100) * 4950L +
      r * (r - 1) / 2 // Σ n_toks = start(nDocs) in closed form
    require(toks == wantToks, s"token accounting broke: $toks != $wantToks")
    println(
      f"provenance: $nDocs%d docs ($toks%d tokens, ${toks / budget}%d packs) x $nSources%d sources " +
        f"attributed in $t%.1f s — $rows%d (pack, source) rows, totals exact"
    )
  }

  /** `diff [nDocs]` — the release diff at corpus scale: two synthetic
    * snapshots over an id space (old drops ids ≡3 mod 10, new drops
    * ≡7 mod 10 and revises content of ids ≡5 mod 13), content a
    * per-id md5 string so the fingerprints do real hashing work. The
    * claim under test: snapshotDiff is two projected scans + one
    * id-keyed join of fingerprint-width rows — content never
    * shuffles — and the status partition is exact. Verified: every
    * status count equals its closed-form residue count (driver
    * arithmetic over the lcm(10,13)=130 residue classes, an
    * independent formula from the operator's join logic).
    */
  private def diffStress(nDocs: Long): Unit = {
    val spark = StressUtil.session()
    def snap(dropMod10: Int, revise: Boolean) = {
      val base = spark
        .range(nDocs)
        .filter(col("id") % 10 =!= dropMod10)
        .withColumnRenamed("id", "doc_id")
      val content =
        if (revise)
          when(col("doc_id") % 13 === 5, concat(md5(col("doc_id").cast("string")), lit(" rev2")))
            .otherwise(md5(col("doc_id").cast("string")))
        else md5(col("doc_id").cast("string"))
      base.withColumn("text", content)
    }
    val (got, t) = StressUtil.timed {
      graft.operators.Maintenance
        .snapshotDiff(snap(3, revise = false), snap(7, revise = true), "doc_id", Seq("text"))
        .groupBy("status")
        .count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
    }
    // Closed-form expected counts over the 130-residue classes.
    def countRes(pred: Long => Boolean): Long = {
      val perBlock = (0L until 130L).count(pred).toLong
      val blocks = nDocs / 130
      blocks * perBlock + (0L until nDocs % 130).count(pred).toLong
    }
    val want = Map(
      "added" -> countRes(r => r % 10 == 3),
      "removed" -> countRes(r => r % 10 == 7),
      "changed" -> countRes(r => r % 10 != 3 && r % 10 != 7 && r % 13 == 5),
      "unchanged" -> countRes(r => r % 10 != 3 && r % 10 != 7 && r % 13 != 5)
    )
    require(got == want, s"status partition broke: $got != $want")
    println(
      f"diff: $nDocs%d-id release diffed in $t%.1f s — " +
        want.toSeq.sorted.map { case (s, c) => s"$s=$c" }.mkString(" ") + ", counts exact"
    )
  }

  /** `vocab [nTokens]` — the dictionary dense-rank at a web-scale
    * vocabulary: nTokens synthetic distinct strings (md5-prefixed so
    * the lexicographic order is nothing like the generation order)
    * ranked through `Vocab.withIds`' range-partition + driver-prefix
    * path, then verified to be exactly the permutation 0..V−1 with
    * ids matching a sampled direct rank computation.
    */
  /** `vocab_build [nDocs] [vocabSize] [nParts]` — `build_vocab` ALONE
    * at the decade past the r11 release soak (271M tokens): nDocs
    * 20-token synthetic docs (default 15M docs = 300M tokens; 60M =
    * 1.2B) over a vocabSize-type dictionary whose md5-prefixed tokens
    * decorrelate lexicographic order from generation order. The two
    * stages are timed SEPARATELY — exactly the attribution the r11
    * 1000× table couldn't give: (1) the corpus-sized token histogram
    * (explode + map-side-combined groupBy — the only stage that scans
    * tokens), (2) the pinned two-pass dense rank over the DISTINCT
    * types (`Vocab.withIds` at `nParts` range partitions — bounded by
    * the dictionary, not the corpus). The permutation + ordered-prefix
    * asserts from `vocab` stay in as the regression tripwire.
    */
  private def vocabBuildStress(nDocs: Long, vocabSize: Long, nParts: Int): Unit = {
    val spark = StressUtil.session()
    val nTokens = nDocs * 20L
    val docs = spark
      .range(nDocs)
      .select(
        col("id").as("doc_id"),
        concat_ws(
          " ",
          (0 until 20).map(j =>
            substring(md5(((col("id") * 20L + j.toLong) % vocabSize).cast("string")), 1, 10)
          ): _*
        ).as("text")
      )
    val (hist, tH) = StressUtil.timed {
      docs
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
    }
    val nTypes = hist.count()
    println(
      f"vocab_build: histogram over $nTokens tokens -> $nTypes types in $tH%.1f s " +
        f"(${nTokens / math.max(tH, 1e-9) / 1e6}%.0f M tok/s)"
    )
    val (ids, tR) = StressUtil.timed {
      graft.operators.Vocab.withIds(hist, "token", nParts).localCheckpoint()
    }
    println(f"vocab_build: two-pass dense rank ($nParts range partitions) in $tR%.1f s")
    val r = ids
      .agg(
        count(lit(1)).as("n"),
        min(col("token_id")).as("lo"),
        max(col("token_id")).as("hi"),
        countDistinct(col("token_id")).as("nd")
      )
      .head()
    require(
      r.getLong(0) == nTypes && r.getLong(1) == 0L &&
        r.getLong(2) == nTypes - 1 && r.getLong(3) == nTypes,
      "ids are not the dense permutation"
    )
    val sample = ids.orderBy(col("token")).limit(1000).collect().map(_.getAs[Long]("token_id"))
    require(sample.toSeq == (0L until sample.length.toLong), "sampled prefix must rank 0..k")
    println("vocab_build: permutation + prefix-order verified")
  }

  private def vocabStress(nTokens: Long): Unit = {
    val spark = StressUtil.session()
    val distinct = spark
      .range(nTokens)
      .select(concat(md5(col("id").cast("string")), lit("_"), col("id").cast("string")).as("token"))
    val nParts = math.max(32, (nTokens / 2000000L).toInt)
    val (ids, t) = StressUtil.timed {
      graft.operators.Vocab.withIds(distinct, "token", nParts).localCheckpoint()
    }
    println(f"vocab: $nTokens tokens ranked ($nParts range partitions) in $t%.1f s")
    val (ok, tv) = StressUtil.timed {
      val r = ids
        .agg(
          count(lit(1)).as("n"),
          min(col("token_id")).as("lo"),
          max(col("token_id")).as("hi"),
          countDistinct(col("token_id")).as("nd")
        )
        .head()
      r.getLong(0) == nTokens && r.getLong(1) == 0L &&
      r.getLong(2) == nTokens - 1 && r.getLong(3) == nTokens
    }
    require(ok, "ids are not the dense permutation")
    // order check on a sample: id order must equal token order
    val sample = ids.orderBy(col("token")).limit(1000).collect().map(_.getAs[Long]("token_id"))
    require(sample.toSeq == (0L until sample.length.toLong), "sampled prefix must rank 0..k")
    println(f"vocab: permutation + prefix-order verified in $tv%.1f s")
  }

  /** `bpe [nDocs] [nMerges] [vocabSize]` — the tokenizer chain at
    * production shape: nDocs 20-word synthetic docs over a
    * vocabSize-word hex vocabulary (20M instances / 200k words at the
    * defaults; raise vocabSize to probe driver-trainer headroom),
    * trained to
    * nMerges (the auto-selected DRIVER trainer path — the histogram
    * is ~2M chars), then scored end to end with `segmentCounts`
    * (ONE native `graft_bpe_apply` expression over the distinct-word
    * table + a join back over every instance). Correctness tripwire
    * at a scale the oracle never sees: 200 sampled words' native
    * per-word symbol counts must equal a driver-side reference fold
    * of the same merge table.
    */
  private def bpeStress(nDocs: Long, nMerges: Int, vocabSize: Long = 200000L): Unit = {
    val spark = StressUtil.session()
    import spark.implicits._
    val docs = spark
      .range(nDocs)
      .select(
        col("id").as("doc_id"),
        concat_ws(
          " ",
          (0 until 20).map(j =>
            substring(md5(((col("id") * 20 + j) % vocabSize).cast("string")), 1, 10)
          ): _*
        ).as("text")
      )
      .localCheckpoint()
    val (merges, tTrain) = StressUtil.timed {
      graft.operators.Bpe.learnMerges(docs, "text", nMerges).map(m => (m.lhs, m.rhs))
    }
    println(f"bpe: trained ${merges.length} merges over ~$vocabSize distinct words in $tTrain%.1f s (driver path)")
    val (totals, tScore) = StressUtil.timed {
      graft.operators.Bpe
        .segmentCounts(docs, "doc_id", "text", merges)
        .agg(sum(col("n_tokens")).as("ws"), sum(col("n_bpe_tokens")).as("bpe"))
        .head()
    }
    val (ws, bpe) = (totals.getLong(0), totals.getLong(1))
    println(f"bpe: scored ${nDocs * 20} token instances in $tScore%.1f s (ws=$ws bpe=$bpe fert=${bpe.toDouble / ws}%.3f)")
    require(ws == nDocs * 20, "whitespace totals must count every instance")
    require(bpe >= ws, "symbols per word are >= 1")
    // native-vs-reference fold on a word sample
    def refFold(word: String): Int =
      merges.foldLeft(word.toVector.map(_.toString)) { case (s, (l, r)) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j + 1 < s.length && s(j) == l && s(j + 1) == r) { out += (l + r); j += 2 }
          else { out += s(j); j += 1 }
        }
        out.result()
      }.length
    val sampleWords = graft.operators.Bpe
      .wordHistogram(docs, "text")
      .select(col("word"))
      .orderBy(col("word"))
      .limit(200)
      .collect()
      .map(_.getString(0))
    val sdf = sampleWords.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq.toDF("doc_id", "text")
    val got = graft.operators.Bpe
      .segmentCounts(sdf, "doc_id", "text", merges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap
    sampleWords.zipWithIndex.foreach { case (w, i) =>
      require(
        got(i.toLong) == refFold(w).toLong,
        s"native apply diverges from the reference fold on '$w' at ${merges.length} merges"
      )
    }
    println("bpe: 200-word native-vs-reference-fold segmentation check passed")
  }

  /** `decontam [nTrain] [nEval]` — the broadcast eval-probe at corpus
    * scale: nTrain synthetic 10-token train docs (every 100th carries a
    * planted 8-token eval phrase → 6/8 shingle overlap, contaminated;
    * the rest are globally unique → absent from the report), nEval
    * benchmark docs over a 997-text closed vocabulary (so the
    * broadcast side stays benchmark-sized however large nEval grows).
    * Measures the end-to-end purge-report wall and asserts the flagged
    * count is EXACTLY the planted count — the correctness tripwire at
    * a scale the oracle never sees.
    */
  private def decontamStress(nTrain: Long, nEval: Long): Unit = {
    // Planted phrases are keyed by id % 997 but only eval docs
    // 0..nEval-1 exist: with nEval < 997 some planted train docs have
    // no eval counterpart and the flagged==planted tripwire would fail
    // SPURIOUSLY — an unsatisfiable configuration, refused loudly.
    require(nEval >= 997, s"decontam stress needs nEval >= 997 (phrase key space), got $nEval")
    val spark = StressUtil.session()
    def evTok(j: Int, v: org.apache.spark.sql.Column) =
      concat(lit(s"ev${j}_"), v.cast("string"))
    val evalDocs = spark
      .range(nEval)
      .select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map(j => evTok(j, col("id") % 997)): _*).as("text")
      )
    def uTok(j: Int) = concat(lit("u"), col("id").cast("string"), lit(s"_$j"))
    val clean = concat_ws(" ", (0 until 10).map(uTok): _*)
    val planted = concat_ws(
      " ",
      (0 until 8).map(j => evTok(j, col("id") % 997)) ++ Seq(uTok(8), uTok(9)): _*
    )
    val train = spark
      .range(nTrain)
      .select(
        col("id").as("doc_id"),
        when(col("id") % 100 === 0, planted).otherwise(clean).as("text")
      )
    val (report, t) = StressUtil.timed {
      graft.operators.Dedup
        .decontamPurge(train, evalDocs, "doc_id", "text")
        .localCheckpoint()
    }
    val flagged = report.filter(col("contaminated")).count()
    val expect = (nTrain + 99) / 100
    // Sub-threshold extras are 28-bit shingle-hash chance collisions
    // with the eval set (~ nShingles × evalSet / 2³¹ ≈ 100 at the
    // defaults) — they carry 1-2 overlapping shingles and never cross
    // the 0.5 gate, which is precisely why the gate is a FRACTION and
    // not any-overlap at corpus scale.
    val extras = report.filter(!col("contaminated"))
    val nExtras = extras.count()
    val maxExtraOverlap =
      if (nExtras == 0) 0L
      else extras.agg(max(col("n_overlap"))).head().getLong(0)
    println(
      f"decontam: $nTrain%d train vs $nEval%d eval docs probed in $t%.1f s; " +
        f"$flagged%d flagged (planted $expect%d); $nExtras%d sub-threshold " +
        f"hash-collision rows (max overlap $maxExtraOverlap%d)"
    )
    require(flagged == expect, s"flagged $flagged != planted $expect")
    require(nExtras < nTrain / 10000 + 10, s"collision rows $nExtras out of expected range")
    require(maxExtraOverlap <= 3, s"a chance collision should overlap 1-2 shingles, saw $maxExtraOverlap")
  }

  /** `fuzzy [nTrain] [nEval] [nHashes] [bandRows]` — the attributed near-dup probe
    * ([[graft.operators.Dedup.decontamFuzzy]]) at corpus scale. Three
    * planted classes: every 100th train doc is an EXACT copy of an
    * eval item (identical minhash signature → every band collides —
    * these MUST all flag at J = 1.0, the exact tripwire), every
    * (100k+50)th is a NEAR copy (last 2 of 12 tokens replaced →
    * whole-set J = 8/12 — banding recall at J≈0.67 is probabilistic
    * in design but DETERMINISTIC for fixed hashes, reported as the
    * recall observable), and the rest are globally unique (shingle-
    * disjoint from the benchmark — the Jaccard verification gives a
    * chance band collision J = 0, so a flagged clean doc is
    * impossible, the false-positive guard). Eval texts cycle a
    * 997-key closed vocabulary, so the broadcast side stays
    * benchmark-shaped however large nEval grows (duplicate eval items
    * simply widen each copy's attribution list).
    */
  private def fuzzyStress(nTrain: Long, nEval: Long, nHashes: Int = 16, bandRows: Int = 4): Unit = {
    require(nEval >= 997, s"fuzzy stress needs nEval >= 997 (phrase key space), got $nEval")
    val spark = StressUtil.session()
    def evTok(j: Int, v: org.apache.spark.sql.Column) =
      concat(lit(s"fv${j}_"), v.cast("string"))
    val evalDocs = spark
      .range(nEval)
      .select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j => evTok(j, col("id") % 997)): _*).as("text")
      )
    def uTok(j: Int) = concat(lit("w"), col("id").cast("string"), lit(s"_$j"))
    val clean = concat_ws(" ", (0 until 12).map(uTok): _*)
    val exactCopy = concat_ws(" ", (0 until 12).map(j => evTok(j, col("id") % 997)): _*)
    val nearCopy = concat_ws(
      " ",
      (0 until 10).map(j => evTok(j, col("id") % 997)) ++ Seq(uTok(10), uTok(11)): _*
    )
    val train = spark
      .range(nTrain)
      .select(
        col("id").as("doc_id"),
        when(col("id") % 100 === 0, exactCopy)
          .when(col("id") % 100 === 50, nearCopy)
          .otherwise(clean)
          .as("text")
      )
    val (report, t) = StressUtil.timed {
      graft.operators.Dedup
        .decontamFuzzy(train, evalDocs, "doc_id", "text", nHashes = nHashes, bandRows = bandRows)
        .localCheckpoint()
    }
    val flagged = report.filter(col("contaminated")).localCheckpoint()
    val nExactFlagged = flagged.filter(col("doc_id") % 100 === 0).count()
    val nNearFlagged = flagged.filter(col("doc_id") % 100 === 50).count()
    val nCleanFlagged = flagged.count() - nExactFlagged - nNearFlagged
    val expectExact = (nTrain + 99) / 100
    val expectNear = if (nTrain > 50) (nTrain - 50 + 99) / 100 else 0L
    val exactStats = flagged
      .filter(col("doc_id") % 100 === 0)
      .agg(min(col("max_jaccard")), min(col("n_matched")))
      .head()
    println(
      f"fuzzy: $nTrain%d train vs $nEval%d eval docs probed in $t%.1f s " +
        f"(${nHashes / bandRows}%d bands x $bandRows%d rows); " +
        f"exact copies $nExactFlagged%d/$expectExact%d flagged, near copies (J=0.667) " +
        f"$nNearFlagged%d/$expectNear%d (banding recall ${nNearFlagged.toDouble / expectNear}%.2f), " +
        f"clean flagged $nCleanFlagged%d"
    )
    require(nExactFlagged == expectExact, s"exact copies must ALL flag: $nExactFlagged/$expectExact")
    require(exactStats.getDouble(0) == 1.0, "an exact copy verifies at J = 1.0")
    require(exactStats.getLong(1) >= 1L, "an exact copy attributes >= 1 eval item")
    require(nCleanFlagged == 0L, s"verification must kill chance collisions, flagged $nCleanFlagged clean docs")
  }

  /** `semantic [nTrain] [nEval]` — the embedding tier
    * ([[graft.operators.Dedup.decontamSemantic]]) at corpus scale,
    * dim 64. Planted classes against deterministic hash-derived eval
    * vectors: every 100th train vector is an EXACT copy of eval
    * id%nEval (cos = 1), every (100k+50)th is a NOISED copy
    * (ev + 0.4·g → cos ≈ 0.93 — the paraphrase stand-in), the rest
    * are independent hash vectors whose best cosine concentrates near
    * 0 with a ~(1−t²)^((d−2)/2) tail — vanishing at the 0.85 gate
    * even over 10¹⁰ pairs, so the clean-flagged tripwire is exact.
    * Generator trap, documented so nobody reintroduces it: Spark's
    * `hash` chains its arguments, so components built as
    * hash(salt, id, d) share the 32-bit chain state after (salt, id)
    * — ONE prefix collision between a clean id and an eval id makes
    * all 64 components IDENTICAL (expected ≈2 over 10⁶×10⁴ id
    * pairs; two cos=1.0 "chance" hits were measured before the fix).
    * Folding the component index in BEFORE the id — hash(salt, d,
    * id) — keeps collisions per-component (2⁻³² each, never all
    * 64). Both planted classes must flag AND attribute their true
    * eval id (nothing else can beat cos 0.93 when every cross pair
    * sits under the gate).
    */
  private def semanticStress(nTrain: Long, nEval: Long): Unit = {
    val spark = StressUtil.session()
    val dim = 64
    def vec(seed: org.apache.spark.sql.Column, salt: Int) =
      transform(
        sequence(lit(0), lit(dim - 1)),
        d => hash(lit(salt), d, seed).cast("double") / 2147483647.0
      )
    val evalVecs = spark
      .range(nEval)
      .select(col("id").as("vec_id"), vec(col("id"), 1).as("embedding"))
    val train = spark
      .range(nTrain)
      .select(
        col("id").as("vec_id"),
        when(col("id") % 100 === 0, vec(col("id") % nEval, 1))
          .when(
            col("id") % 100 === 50,
            zip_with(vec(col("id") % nEval, 1), vec(col("id"), 2), (a, b) => a + lit(0.4) * b)
          )
          .otherwise(vec(col("id"), 3))
          .as("embedding")
      )
    val (report, t) = StressUtil.timed {
      graft.operators.Dedup
        .decontamSemantic(train, evalVecs, "vec_id", "embedding", threshold = 0.85)
        .localCheckpoint()
    }
    val flagged = report.filter(col("contaminated")).localCheckpoint()
    val nExact = flagged.filter(col("vec_id") % 100 === 0).count()
    val nNoised = flagged.filter(col("vec_id") % 100 === 50).count()
    val nClean = flagged.count() - nExact - nNoised
    val expectExact = (nTrain + 99) / 100
    val expectNoised = if (nTrain > 50) (nTrain - 50 + 99) / 100 else 0L
    val misattributed = flagged
      .filter(col("best_eval_id") =!= col("vec_id") % nEval)
      .count()
    println(
      f"semantic: $nTrain%d train vs $nEval%d eval vectors (dim $dim%d) audited in $t%.1f s; " +
        f"exact $nExact%d/$expectExact%d, noised (cos~0.93) $nNoised%d/$expectNoised%d, " +
        f"clean flagged $nClean%d, misattributed $misattributed%d"
    )
    require(nExact == expectExact, s"exact copies must all flag: $nExact/$expectExact")
    require(nNoised == expectNoised, s"noised copies must all flag: $nNoised/$expectNoised")
    require(nClean == 0L, s"chance cosine must stay under the gate, flagged $nClean clean vectors")
    require(misattributed == 0L, s"every flagged vector must attribute its true eval id, $misattributed wrong")
  }

  private def pack(corpusDir: String, nBatches: Int, rows: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("pack-batches").toString
    val docs = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    graft.operators.Packing
      .packIngest(spark, docs, "doc_id", "text", s"$root/st", 0L)
      .write
      .mode("overwrite")
      .parquet(s"$root/m/pack_batch=0")
    println(s"[pack-batches] backfill: $n docs; now $nBatches batches x $rows docs")
    val times = (1 to nBatches).map { i =>
      val b = docs
        .limit(rows)
        .select((col("doc_id") + i.toLong * 10000000L).as("doc_id"), col("text"))
      val (_, t) = StressUtil.timed {
        graft.operators.Packing
          .packIngest(spark, b, "doc_id", "text", s"$root/st", i.toLong)
          .write
          .mode("overwrite")
          .parquet(s"$root/m/pack_batch=$i")
      }
      t
    }
    def win(a: Int, b: Int) = times.slice(a, b).sum / (b - a)
    val stateKiB = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(s"$root/st")) / 1024
    println(
      f"[pack-batches] per-batch wall: batches 1-10 avg ${win(0, 10)}%.2f s, " +
        f"${nBatches / 2 - 4}-${nBatches / 2 + 5} avg ${win(nBatches / 2 - 5, nBatches / 2 + 5)}%.2f s, " +
        f"last 10 avg ${win(nBatches - 10, nBatches)}%.2f s (flat = cost independent of pack-space age); " +
        f"offset state after ${nBatches + 1} batches: $stateKiB KiB"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  /** `batches <corpusParquetDir> [nBatches] [rowsPerBatch]` — probe
    * cost over a LONG crawl: after a corpus backfill, run 100+ small
    * re-crawl batches and report per-batch wall in windows, plus the
    * index layout's partition/file counts. Without index
    * self-compaction each batch leaves one more partition forever and
    * the probe's open cost grows linearly with crawl AGE; with it the
    * count is bounded and the steady-state number stays flat.
    */
  private def batches(corpusDir: String, nBatches: Int, rows: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("curate-batches").toString
    val (model, spans, index, out) = (s"$root/lm", s"$root/spans", s"$root/index", s"$root/out")
    val docs = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    graft.operators.QualityModel.build(spark, docs, "doc_id", "text", model)
    graft.pipeline.Pipeline.curateIngest(spark, docs, model, spans, index, out, 0L)
    println(s"[curate-batches] backfill: $n docs; now $nBatches batches x $rows docs")
    val stats = (1 to nBatches).map { i =>
      val b = docs
        .limit(rows)
        .select((col("doc_id") + i.toLong * 10000000L).as("doc_id"), col("text"))
      val before = fileSnapshot(new java.io.File(index))
      val (_, t) =
        StressUtil.timed(
          graft.pipeline.Pipeline.curateIngest(spark, b, model, spans, index, out, i.toLong)
        )
      (t, bytesWritten(before, fileSnapshot(new java.io.File(index))))
    }
    val times = stats.map(_._1)
    def win(a: Int, b: Int) = times.slice(a, b).sum / (b - a)
    println(
      f"[curate-batches] per-batch wall: batches 1-10 avg ${win(0, 10)}%.2f s, " +
        f"${nBatches / 2 - 4}-${nBatches / 2 + 5} avg ${win(nBatches / 2 - 5, nBatches / 2 + 5)}%.2f s, " +
        f"last 10 avg ${win(nBatches - 10, nBatches)}%.2f s (flat = probe cost independent of crawl age)"
    )
    val bw = stats.map(_._2)
    val k = bw.length / 3
    val bwThirds = Seq(bw.take(k), bw.slice(k, 2 * k), bw.drop(2 * k))
      .map(w => s"${w.sum / math.max(w.length, 1) / 1024} KiB")
      .mkString(" / ")
    println(
      s"[curate-batches] per-batch INDEX bytes written (thirds, early/mid/late): $bwThirds " +
        "(tiered compaction: flat = amortized write volume independent of crawl age)"
    )
    val parts = new java.io.File(index)
      .listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
    println(
      s"[curate-batches] index partitions after ${nBatches + 1} batches: $parts (bounded by self-compaction; unbounded = one per batch forever)"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  /** `zipf <corpusParquetDir> [shards]` — the COMPOSED jobs on a
    * hot-key corpus: every doc gets the same boilerplate sentence
    * appended (8 ultra-hot 3-grams, df = corpus size). SpanStress's
    * zipf mode proves the feature pass's window-buffer bound in
    * isolation; this run proves the COMPOSITIONS survive the same
    * corpus — `curateCorpus` end to end, then a `curateIngest`
    * steady-state batch against the populated states — reporting the
    * max single window partition the composed span stage buffers
    * (must be ≤ SpanDfCap regardless of corpus size) and wall-clock.
    */
  private def zipf(corpusDir: String, shards: Int): Unit = {
    val spark = StressUtil.session()
    graft.functions.GraftFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("curate-zipf").toString
    val boiler = "the quick brown fox jumps over the lazy dog end"
    spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .withColumn("text", concat(col("text"), lit(" " + boiler)))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write
      .parquet(s"$root/zc/documents.parquet")
    val zdir = s"$root/zc"
    val docs = spark.read.parquet(s"$zdir/documents.parquet")
    val n = docs.count()
    println(s"[curate-zipf] corpus: $n docs, boilerplate df = $n per hot 3-gram")
    // The structural number for the composed span stage: the largest
    // window partition one task buffers under the df-cap split.
    val dfs = docs
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
      s"[curate-zipf] hot-key df = $maxDf; max window partition inside the composed span stage = " +
        s"$maxCold (<= SpanDfCap = $cap at ANY corpus size; the hot spans ride the broadcast pre-flag)"
    )
    graft.queries.TextQueries.clearFeatureMemo()
    val ((in, out), t) = StressUtil.timed(
      graft.pipeline.Pipeline.curateCorpus(spark, zdir, s"$root/out", shards)
    )
    println(f"[curate-zipf] composed batch curate on the hot-key corpus: $t%.1f s, $in -> $out docs")
    // Incremental twin: freeze + backfill, then a hot-key steady batch.
    val (model, spans, index, iout) = (s"$root/lm", s"$root/spans", s"$root/index", s"$root/iout")
    graft.operators.QualityModel.build(spark, docs, "doc_id", "text", model)
    val ((_, acc0), t0) = StressUtil.timed(
      graft.pipeline.Pipeline.curateIngest(spark, docs, model, spans, index, iout, 0L)
    )
    println(f"[curate-zipf] ingest backfill ($n docs, hot keys): $t0%.1f s, accepted $acc0")
    val b1 = docs
      .limit(2000)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val ((in1, acc1), t1) = StressUtil.timed(
      graft.pipeline.Pipeline.curateIngest(spark, b1, model, spans, index, iout, 1L)
    )
    println(
      f"[curate-zipf] ingest steady-state batch ($in1 docs vs hot-key states): $t1%.1f s, accepted $acc1"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  /** `stream <corpusParquetDir> [batchRows]` — the `curate_stream`
    * steady state: backfill the corpus through the STREAMING verb
    * (one drain), then drop a re-crawl-shaped file into the raw dir
    * and time the second drain against the populated states — the
    * batch `curate_ingest` number plus the engine's checkpoint/
    * trigger/file-tracking overhead, measured rather than assumed.
    */
  private def stream(corpusDir: String, batchRows: Int): Unit = {
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("curate-stream-stress").toString
    val (raw, model, spans, index, out, ckpt) =
      (s"$root/raw", s"$root/lm", s"$root/spans", s"$root/index", s"$root/out", s"$root/ckpt")
    new java.io.File(raw).mkdirs()
    val docs = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    graft.operators.QualityModel.build(spark, docs, "doc_id", "text", model)
    // Backfill file dropped first; each drain is AvailableNow.
    docs.coalesce(1).write.json(s"$root/j0")
    moveJson(s"$root/j0", raw, "backfill")
    val (_, t0) = StressUtil.timed {
      graft.streaming.StreamingPipeline
        .curateIngestStream(
          spark, raw, model, spans, index, out, ckpt, graft.schemas.Schemas.documentIngest
        )
        .awaitTermination()
    }
    println(f"[curate-stream] backfill drain ($n docs -> states): $t0%.1f s")
    docs
      .limit(batchRows)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      .coalesce(1)
      .write
      .json(s"$root/j1")
    moveJson(s"$root/j1", raw, "batch1")
    val (_, t1) = StressUtil.timed {
      graft.streaming.StreamingPipeline
        .curateIngestStream(
          spark, raw, model, spans, index, out, ckpt, graft.schemas.Schemas.documentIngest
        )
        .awaitTermination()
    }
    println(
      f"[curate-stream] steady-state drain ($batchRows docs vs $n-doc states, restart from checkpoint): $t1%.1f s"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  /** `chain <corpusParquetDir> [batchRows]` — the full curation →
    * packing chain steady state: backfill drain through
    * `curate_stream`, chain-consumer drain through
    * `packCuratedStream` (parquet tail of the curated corpus →
    * batch-keyed pack manifests), then the same pair again for one
    * re-crawl-shaped file against populated states, and finally a
    * `materializePacks` window read over the chain's output. Raw crawl
    * files in, training sequences out — each stage's steady-state
    * wall measured separately so the chain's cost reads as the sum of
    * its parts (SCALE.md row).
    */
  private def chain(corpusDir: String, batchRows: Int): Unit = {
    val spark = StressUtil.session()
    val root = java.nio.file.Files.createTempDirectory("chain-stress").toString
    val (raw, model, spans, index, out, ckpt) =
      (s"$root/raw", s"$root/lm", s"$root/spans", s"$root/index", s"$root/out", s"$root/ckpt")
    val (pstate, manifests, pckpt) = (s"$root/pstate", s"$root/manifests", s"$root/pckpt")
    new java.io.File(raw).mkdirs()
    val docs = spark.read
      .parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    graft.operators.QualityModel.build(spark, docs, "doc_id", "text", model)
    def curateDrain(): Double =
      StressUtil.timed {
        graft.streaming.StreamingPipeline
          .curateIngestStream(
            spark, raw, model, spans, index, out, ckpt, graft.schemas.Schemas.documentIngest
          )
          .awaitTermination()
      }._2
    def packDrain(): Double =
      StressUtil.timed {
        graft.streaming.StreamingPipeline
          .packCuratedStream(spark, out, pstate, manifests, pckpt)
          .awaitTermination()
      }._2
    docs.coalesce(1).write.json(s"$root/j0")
    moveJson(s"$root/j0", raw, "backfill")
    val tc0 = curateDrain()
    val tp0 = packDrain()
    println(f"[chain] backfill: curate drain $tc0%.1f s + pack drain $tp0%.1f s ($n docs)")
    docs
      .limit(batchRows)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      .coalesce(1)
      .write
      .json(s"$root/j1")
    moveJson(s"$root/j1", raw, "batch1")
    val tc1 = curateDrain()
    val tp1 = packDrain()
    // Window = the last 3 packs INCLUDING the in-progress partial one
    // (on a dup-heavy corpus the whole curated stream can be shorter
    // than one full pack).
    val packTo = graft.operators.Packing
      .baseRows(spark, pstate)
      .map(_._3)
      .maxOption
      .getOrElse(0L) / 2048L + 1
    val (nTok, tr) = StressUtil.timed {
      graft.operators.Packing
        .materializePacks(
          spark, pstate, manifests,
          spark.read.parquet(out).select("doc_id", "text"),
          "doc_id", "text",
          math.max(0L, packTo - 3), packTo, 2048L
        )
        .count()
    }
    println(
      f"[chain] steady state ($batchRows docs vs $n-doc states): curate drain $tc1%.1f s + pack drain $tp1%.1f s; " +
        f"loader window read (last 3 packs, $nTok token rows): $tr%.1f s"
    )
    // Export tail: freeze the dictionary over the curated corpus, then
    // hand the same window off as id-array shards (the pack_export
    // path) — closing the raw → curate → pack → export loop in one run.
    val (vocabN, tv) = StressUtil.timed {
      val v = graft.operators.Vocab
        .build(spark.read.parquet(out).select("text"), "text")
        .localCheckpoint()
      v.write.mode("overwrite").parquet(s"$root/vocab")
      v.count()
    }
    val (nPacks, te) = StressUtil.timed {
      val slices = graft.operators.Packing
        .materializePacks(
          spark, pstate, manifests,
          spark.read.parquet(out).select("doc_id", "text"),
          "doc_id", "text",
          math.max(0L, packTo - 3), packTo, 2048L
        )
      val arrays = graft.operators.Vocab
        .packArrays(slices, spark.read.parquet(s"$root/vocab"))
      graft.operators.Scale
        .exportShards(arrays, "pack_id", 2, s"$root/export")
        .agg(sum(col("n_rows")))
        .head()
        .getLong(0)
    }
    println(
      f"[chain] export tail: $vocabN-token vocab frozen in $tv%.1f s; " +
        f"window re-materialized + encoded + sharded ($nPacks packs) in $te%.1f s"
    )
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }

  private def moveJson(srcDir: String, dstDir: String, prefix: String): Unit =
    new java.io.File(srcDir)
      .listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .zipWithIndex
      .foreach { case (f, i) =>
        java.nio.file.Files.move(
          f.toPath,
          java.nio.file.Paths.get(dstDir, s"$prefix-$i.json")
        )
      }

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
