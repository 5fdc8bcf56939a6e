package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DURABLE tree-membership state — the build-once/fold-batches arm of
  * [[ConvTree]], completing the incremental discipline every other
  * family here has (exact/near/span/semantic dedup, IVF, DSIR, arena
  * wins, packing): a turn store at campaign scale appends turn batches
  * continuously, and recomputing [[ConvTree.treePaths]]' pointer-
  * doubling closure per invocation pays log-depth cluster barrier
  * rounds plus full-store integrity gates on EVERY drain. This state
  * persists the membership table `(conv_id, path_id, pos, turn_id,
  * train)` under a state root and folds each appended batch
  * incrementally:
  *
  *   - a new leaf under an existing node ADDS one path — its prefix
  *     rows are READ from the existing memberships (the attachment
  *     parent's unique first-visit row anchors one path; the rows with
  *     `pos ≤` the parent's position on that path ARE the root→parent
  *     chain — ancestor chains in a tree don't depend on which path
  *     carries them);
  *   - a turn appended to a CURRENT LEAF extends that leaf's path: the
  *     path key is the leaf id, so the old path's rows are REPLACED by
  *     the extended path under the new leaf's id;
  *   - batches may carry whole subtrees (turns chaining within the
  *     batch) and brand-new roots: the batch-LOCAL structure runs
  *     through [[ConvTree.treePaths]] itself (its uniqueness/orphan/
  *     cycle gates fire on the batch), and each batch-subtree's paths
  *     are stitched onto their attachment prefixes.
  *
  * FIRST-VISIT MAINTENANCE. A turn's `train` flag is `path_id ==
  * min(path_id over its memberships)`. Under monotonically growing
  * turn ids (the common store shape) an untouched turn's flag is
  * STABLE: new leaves carry larger ids, so they can never undercut an
  * existing minimum — proven by the spec suite. The fold does NOT rely
  * on that: it recomputes the minimum for exactly the turns whose
  * membership set changed — every turn on a new path, plus the turns
  * whose train-carrying path was deleted by a leaf extension (the one
  * way an existing minimum can DISAPPEAR: extend leaf L under a turn
  * that also has leaf M > L, and the turn's flag must MOVE to M, not
  * to L's big-id extension) — so even a non-monotone store (a late
  * regeneration forking an old node with a small id) folds to exactly
  * the from-scratch [[ConvTree.treePaths]] result. Turns outside that
  * set keep their flags: their membership sets only ever GROW by
  * larger... no — only ever stay identical (a turn on no new and no
  * deleted path has exactly the same path set), so their minima are
  * untouched by construction, monotone ids or not.
  *
  * Integrity (all LOUD, all before any write): batch `(conv, turn)`
  * keys unique; no batch key collides with a state key (a re-sent turn
  * row must be deduplicated upstream — `_applied_id` handles exact
  * batch replays); every batch parent resolves within its conversation
  * to a state turn or a batch turn; batch-internal cycles refused by
  * the doubling-round guard; every attachment parent must hold a
  * first-visit membership in the state (always true for a valid state
  * — checked anyway so a hand-edited state fails here instead of
  * silently dropping paths).
  *
  * Exactly-once: [[Maintenance.foldState]]'s `_applied_id` marker +
  * atomic tmp/old swap — a replayed batch is a no-op, a crash between
  * the swap's renames is healed at entry.
  *
  * Scale shape: per fold, the batch-local closure is O(batch) with
  * log₂(batch depth) rounds (never the store); prefix/extension/flag
  * work is keyed joins of the membership table against BATCH-SIZED
  * key sets (attachment anchors, extended leaves, affected turns —
  * all broadcast), so the read side is map-side; and the state is
  * conv-hash BUCKETED (`cv=` hive partitions, see [[fold]]) so both
  * the read AND the rewrite touch only the buckets the batch's
  * conversations hash into — fold cost follows the batch, not the
  * store (partition pruning serves the reads; the spec asserts
  * untouched buckets keep their files byte-untouched).
  */
object TreeState {

  private val COLS = Seq("conv_id", "path_id", "pos", "turn_id", "train")

  /** The state's membership table, exactly [[ConvTree.treePaths]]'
    * output over every folded turn ever appended. Heals a reshard
    * stranded between its whole-root renames first, so a reader never
    * sees a vanished state.
    */
  def memberships(spark: SparkSession, statePath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Maintenance.recoverSwap(fs, root, new org.apache.hadoop.fs.Path(s"$statePath.__reshard_old"))
    spark.read.parquet(statePath).select(COLS.map(col): _*)
  }

  /** Re-partition an existing state under a NEW bucket count — the
    * escape hatch for a `_buckets` pin sized before the store's growth
    * was known (the span family's `span_state_compact --buckets`
    * discipline). One full read + one cv-keyed write under the new
    * hash, swapped in whole via the rename-pair protocol; the root
    * `_applied_id` survives (exactly-once semantics are unchanged),
    * per-bucket `_seg_applied` markers do NOT carry over (they are
    * retry-convergence state for a specific applied id; their absence
    * just means no bucket short-circuits on the next retry — safe).
    * Crash between the two renames heals at the next [[fold]] /
    * [[memberships]] / [[reshard]] entry.
    */
  def reshard(spark: SparkSession, statePath: String, newBuckets: Int): Unit = {
    require(newBuckets > 0 && newBuckets <= 4096, s"buckets must be in [1, 4096], got $newBuckets")
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldRoot = new org.apache.hadoop.fs.Path(s"$statePath.__reshard_old")
    val tmpRoot = new org.apache.hadoop.fs.Path(s"$statePath.__reshard_tmp")
    Maintenance.recoverSwap(fs, root, oldRoot)
    require(fs.exists(root), s"no TreeState at $statePath")
    require(
      Maintenance.readTextFile(fs, new org.apache.hadoop.fs.Path(root, "_buckets")).isDefined,
      s"TreeState at $statePath has no _buckets pin — not a segmented state; rebuild instead"
    )
    val applied = Maintenance.readTextFile(fs, new org.apache.hadoop.fs.Path(root, "_applied_id"))
    Maintenance.deleteOrFail(fs, tmpRoot)
    memberships(spark, statePath)
      .withColumn("cv", pmod(hash(col("conv_id")), lit(newBuckets)))
      .repartition(col("cv"))
      .write
      .partitionBy("cv")
      .mode("overwrite")
      .parquet(tmpRoot.toString)
    Maintenance.writeTextFile(
      fs, new org.apache.hadoop.fs.Path(tmpRoot, "_buckets"), newBuckets.toString)
    applied.foreach(a =>
      Maintenance.writeTextFile(fs, new org.apache.hadoop.fs.Path(tmpRoot, "_applied_id"), a))
    Maintenance.swapInto(fs, tmpRoot, root, oldRoot)
  }

  /** Metadata-only sizing report: (bucket, bytes) per `cv=` dir plus
    * the `_buckets` pin — the observable a store operator reads before
    * deciding to [[reshard]] (the `span_state_report` discipline).
    */
  def report(spark: SparkSession, statePath: String): Seq[(Int, Long)] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Maintenance.recoverSwap(fs, root, new org.apache.hadoop.fs.Path(s"$statePath.__reshard_old"))
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cv="))
      .map(st =>
        (st.getPath.getName.drop(3).toInt, fs.getContentSummary(st.getPath).getLength))
      .sortBy(_._1)
      .toIndexedSeq
  }

  /** Fold one appended turn batch into the membership state at
    * `statePath` (created on first fold). Returns the post-fold
    * memberships. `appliedId` is the exactly-once batch marker.
    *
    * LAYOUT: the state is hive-partitioned by a conversation-hash
    * bucket (`cv = pmod(hash(conv_id), buckets)`, `buckets` pinned in
    * `_buckets` at creation — later calls ignore their parameter). A
    * conversation's rows live wholly in one bucket and every fold
    * effect is conv-local, so a fold REWRITES ONLY THE BUCKETS ITS
    * BATCH TOUCHES — read and write cost follow the batch's
    * conversation set, not the store (the full-state
    * refreshAggregate rewrite this replaces was O(store) per fold).
    * Unlike the span family's append-only segments (sound there
    * because min/max merge-on-read is idempotent), membership rows
    * are REPLACED by leaf extensions and flag moves, so the unit of
    * convergence is the bucket rewrite:
    *
    *   - each rewritten bucket lands with a `_seg_applied` marker
    *     INSIDE it (written into the staging dir before the swap, so
    *     marker and content move atomically);
    *   - a retry of a crashed fold skips buckets whose marker already
    *     carries this `appliedId` — and EXCLUDES their batch rows
    *     from the re-fold (they are already in the state; re-folding
    *     them would fire the collision gate) — and recomputes the
    *     rest from their unchanged old content, which is
    *     deterministic, so retries converge from any crash point;
    *   - per-bucket swaps go through the rename-pair protocol with
    *     entry healing ([[Maintenance.recoverSwap]] per stranded
    *     bucket), so a crash between a bucket's two renames never
    *     loses its old content;
    *   - the root `_applied_id` advances only after every touched
    *     bucket landed — the global short-circuit for exact replays.
    *
    * Contract: with `appliedId` set, a failed fold must be RETRIED
    * with the same id until it applies (foreachBatch's at-least-once,
    * the `turns_stream` arm) — an abandoned half-applied batch leaves
    * the store mid-fold, exactly like abandoning a failed span-state
    * batch. Ids must be unique per batch. `appliedId = None` skips
    * all convergence machinery (single-shot callers only).
    */
  def fold(
      spark: SparkSession,
      batch: DataFrame,
      convCol: String,
      turnCol: String,
      parentCol: String,
      statePath: String,
      appliedId: Option[Long],
      maxDepth: Int = 10000,
      buckets: Int = 64
  ): DataFrame = {
    require(buckets > 0 && buckets <= 4096, s"buckets must be in [1, 4096], got $buckets")
    val b = batch.select(
      col(convCol).as("conv_id"),
      col(turnCol).as("turn_id"),
      col(parentCol).as("parent_id")
    )
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$statePath.__fold_tmp")
    val oldRoot = new org.apache.hadoop.fs.Path(s"$statePath.__fold_old")
    // ── entry healing ─────────────────────────────────────────────
    // A reshard stranded between its whole-root renames first (a
    // vanished root would otherwise read as "no state" and silently
    // rebuild from this batch alone)...
    Maintenance.recoverSwap(fs, root, new org.apache.hadoop.fs.Path(s"$statePath.__reshard_old"))
    // ...then buckets stranded between a crashed fold swap's two
    // renames: restore from the old dir when the target vanished,
    // clear the old dir when the target landed. Must run before
    // anything reads the state.
    if (fs.exists(oldRoot)) {
      fs.listStatus(oldRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cv="))
        .foreach { st =>
          Maintenance.recoverSwap(fs, new org.apache.hadoop.fs.Path(root, st.getPath.getName), st.getPath)
        }
      Maintenance.deleteOrFail(fs, oldRoot)
    }
    val bucketsPin = new org.apache.hadoop.fs.Path(root, "_buckets")
    val exists = fs.exists(root)
    val k: Int =
      if (!exists) buckets
      else
        Maintenance.readTextFile(fs, bucketsPin) match {
          case Some(s) => s.trim.toInt
          case None =>
            throw new IllegalArgumentException(
              s"TreeState at $statePath has no _buckets pin — a pre-segmentation (or foreign) " +
                "state layout cannot be folded into; rebuild by re-folding the turn store " +
                "into a fresh --state dir"
            )
        }
    def marker(p: org.apache.hadoop.fs.Path): Option[Long] =
      Maintenance.readTextFile(fs, p).map(_.trim.toLong)
    if (exists && appliedId.isDefined &&
      marker(new org.apache.hadoop.fs.Path(root, "_applied_id")) == appliedId)
      return memberships(spark, statePath) // retry of an applied batch: no-op
    Maintenance.deleteOrFail(fs, tmp) // stale staging from a crashed attempt
    if (!exists) {
      fs.mkdirs(root)
      Maintenance.writeTextFile(fs, bucketsPin, k.toString)
    }
    val segOf = pmod(hash(col("conv_id")), lit(k))
    val touched: Seq[Int] = b
      .select(segOf.as("__cv"))
      .distinct()
      .collect()
      .map(_.getInt(0))
      .sorted
      .toIndexedSeq
    val alreadyApplied: Set[Int] = appliedId match {
      case Some(id) =>
        touched.filter(s =>
          marker(new org.apache.hadoop.fs.Path(root, s"cv=$s/_seg_applied")).contains(id)).toSet
      case None => Set.empty
    }
    val pending = touched.filterNot(alreadyApplied)
    if (pending.nonEmpty) {
      val bPending =
        if (alreadyApplied.isEmpty) b
        else b.filter(segOf.isin(pending.map(Int.box): _*))
      val hasData = fs.exists(root) && fs
        .listStatus(root)
        .exists(st => st.isDirectory && st.getPath.getName.startsWith("cv="))
      val mTouched =
        if (hasData)
          spark.read
            .parquet(statePath)
            .filter(col("cv").isin(pending.map(Int.box): _*))
            .select(COLS.map(col): _*)
        else
          // typed empty membership table (first fold / first-fold retry)
          b.select(
            col("conv_id"),
            col("turn_id").as("path_id"),
            lit(0L).as("pos"),
            col("turn_id"),
            lit(true).as("train")
          ).limit(0)
      val folded = foldInto(mTouched, bPending, maxDepth)
      folded
        .withColumn("cv", segOf)
        // one cv-keyed shuffle so each bucket lands as ONE file —
        // without it every task writes a file into every bucket it
        // holds rows for (tasks × buckets small files), and the next
        // fold pays the footer fan-out reading them back
        .repartition(col("cv"))
        .write
        .partitionBy("cv")
        .mode("overwrite")
        .parquet(tmp.toString)
      fs.mkdirs(oldRoot)
      pending.foreach { s =>
        val staged = new org.apache.hadoop.fs.Path(tmp, s"cv=$s")
        require(
          fs.exists(staged),
          s"TreeState.fold: bucket $s was touched by the batch but produced no staged rows — " +
            "the fold output is inconsistent; refusing to swap"
        )
        appliedId.foreach(id =>
          Maintenance.writeTextFile(
            fs, new org.apache.hadoop.fs.Path(staged, "_seg_applied"), id.toString))
        val target = new org.apache.hadoop.fs.Path(root, s"cv=$s")
        val old = new org.apache.hadoop.fs.Path(oldRoot, s"cv=$s")
        Maintenance.swapInto(fs, staged, target, old)
      }
      Maintenance.deleteOrFail(fs, tmp)
      if (fs.exists(oldRoot)) Maintenance.deleteOrFail(fs, oldRoot)
    }
    appliedId.foreach(id =>
      Maintenance.writeTextFile(fs, new org.apache.hadoop.fs.Path(root, "_applied_id"), id.toString))
    memberships(spark, statePath)
  }

  /** The incremental fold proper: `m` the current memberships, `b` the
    * canonicalized batch turns. Pure DataFrame → DataFrame (no I/O) so
    * the spec suite can drive it directly against from-scratch replays.
    */
  private[graft] def foldInto(m: DataFrame, b: DataFrame, maxDepth: Int): DataFrame = {
    // ── gates ─────────────────────────────────────────────────────
    // (batch-internal uniqueness + cycles fire inside treePaths below;
    // here: state collision and parent resolution.) Both gates probe
    // the O(state) membership table with BROADCAST batch-derived key
    // sets — map-side scans, never a state-wide shuffle (the original
    // form ran a distinct over the whole state per fold, which at
    // campaign scale is the single most expensive exchange the fold
    // could possibly issue, spent on a gate).
    val bTurnKeys = b.select(col("conv_id"), col("turn_id"))
    val collided = m
      .join(broadcast(bTurnKeys), Seq("conv_id", "turn_id"), "left_semi")
      .select(col("conv_id"), col("turn_id"))
      .limit(1)
      .collect()
    require(
      collided.isEmpty,
      s"TreeState.fold: batch turn ${collided.headOption.map(_.get(1)).orNull} in " +
        s"conversation ${collided.headOption.map(_.get(0)).orNull} already exists in the " +
        "state — appended batches must carry NEW turns only (an exact batch replay is " +
        "handled by the _applied_id marker; a re-edited turn needs a state rebuild)"
    )
    // parents unresolved WITHIN the batch (small × small anti-join),
    // then a map-side probe of the state for just those keys; whatever
    // the state doesn't know either is an orphan — named through a
    // join back to a referencing batch turn.
    val unresolvedInBatch = b
      .filter(col("parent_id").isNotNull)
      .select(col("conv_id"), col("parent_id").as("turn_id"))
      .distinct()
      .join(bTurnKeys, Seq("conv_id", "turn_id"), "left_anti")
    val resolvedByState = m
      .join(broadcast(unresolvedInBatch), Seq("conv_id", "turn_id"), "left_semi")
      .select(col("conv_id"), col("turn_id"))
      .distinct()
    val orphans = unresolvedInBatch
      .join(broadcast(resolvedByState), Seq("conv_id", "turn_id"), "left_anti")
      .withColumnRenamed("turn_id", "parent_id")
      .join(b.select(col("conv_id"), col("turn_id"), col("parent_id")), Seq("conv_id", "parent_id"))
      .limit(1)
      .collect()
    require(
      orphans.isEmpty,
      s"TreeState.fold: batch turn ${orphans.headOption.map(_.get(2)).orNull} in " +
        s"conversation ${orphans.headOption.map(_.get(0)).orNull} has parent " +
        s"${orphans.headOption.map(_.get(1)).orNull} which is neither a state turn nor a " +
        "batch turn of that conversation — an orphaned pointer would silently truncate " +
        "its path"
    )
    // ── batch-local structure ─────────────────────────────────────
    // Parents pointing OUTSIDE the batch attach to the state: null
    // them for the batch-local walk (treePaths' own gates fire on the
    // batch), and remember the attachment per batch turn.
    val bKeys = b.select(col("conv_id"), col("turn_id").as("parent_id"))
    val bLocal = b
      .join(bKeys.withColumn("__in_batch", lit(true)), Seq("conv_id", "parent_id"), "left")
      .select(
        col("conv_id"),
        col("turn_id"),
        when(col("__in_batch"), col("parent_id")).otherwise(lit(null)).as("local_parent"),
        when(col("__in_batch").isNull && col("parent_id").isNotNull, col("parent_id"))
          .as("attach")
      )
      .localCheckpoint()
    val localMemb = ConvTree
      .treePaths(bLocal, "conv_id", "turn_id", "local_parent", maxDepth)
      .select(col("conv_id"), col("path_id"), col("pos"), col("turn_id"))
      .localCheckpoint()
    // Per batch path: its subtree root's attachment parent (null for a
    // brand-new conversation root).
    val roots = localMemb
      .filter(col("pos") === 0L)
      .select(col("conv_id"), col("path_id"), col("turn_id"))
      .join(bLocal.select(col("conv_id"), col("turn_id"), col("attach")), Seq("conv_id", "turn_id"))
      .select(col("conv_id"), col("path_id"), col("attach"))
      .localCheckpoint()
    // ── attachment anchors + prefixes ─────────────────────────────
    val attachParents = roots
      .filter(col("attach").isNotNull)
      .select(col("conv_id"), col("attach").as("turn_id"))
      .distinct()
      .localCheckpoint()
    val anchor = m
      .filter(col("train"))
      .join(broadcast(attachParents), Seq("conv_id", "turn_id"))
      .select(
        col("conv_id"),
        col("turn_id").as("__p"),
        col("path_id").as("__apath"),
        col("pos").as("__apos")
      )
      .localCheckpoint()
    val nAttach = attachParents.count()
    val nAnchor = anchor.count()
    require(
      nAnchor == nAttach,
      s"TreeState.fold: $nAttach attachment parent(s) but only $nAnchor first-visit " +
        "anchor(s) in the state — the membership table is corrupt (every state turn " +
        "must carry exactly one train membership); rebuild the state from the turn store"
    )
    // Root→parent chains, read off the anchor paths: keyed by the
    // attachment parent, one row per ancestor (the parent included).
    val prefix = m
      .join(
        broadcast(anchor.select(col("conv_id"), col("__apath").as("path_id"), col("__p"), col("__apos"))),
        Seq("conv_id", "path_id")
      )
      .filter(col("pos") <= col("__apos"))
      .select(col("conv_id"), col("__p"), col("pos"), col("turn_id"), col("__apos"))
    // ── new membership rows ───────────────────────────────────────
    val attachedRoots = roots
      .filter(col("attach").isNotNull)
      .join(
        broadcast(anchor.withColumnRenamed("conv_id", "__aconv")),
        col("conv_id") === col("__aconv") && col("attach") === col("__p")
      )
      .select(col("conv_id"), col("path_id"), col("__p"), col("__apos"))
      .localCheckpoint()
    val newPrefix = attachedRoots
      .select(col("conv_id"), col("path_id"), col("__p"))
      .join(prefix.drop("__apos"), Seq("conv_id", "__p"))
      .select(col("conv_id"), col("path_id"), col("pos"), col("turn_id"))
    val newSuffix = localMemb
      .join(
        broadcast(attachedRoots.select(col("conv_id"), col("path_id"), col("__apos"))),
        Seq("conv_id", "path_id")
      )
      .select(
        col("conv_id"),
        col("path_id"),
        (col("__apos") + lit(1L) + col("pos")).as("pos"),
        col("turn_id")
      )
    val newRootPaths = localMemb
      .join(
        broadcast(roots.filter(col("attach").isNull).select(col("conv_id"), col("path_id"))),
        Seq("conv_id", "path_id")
      )
      .select(col("conv_id"), col("path_id"), col("pos"), col("turn_id"))
    val newRows = newPrefix
      .unionByName(newSuffix)
      .unionByName(newRootPaths)
      .localCheckpoint()
    // ── leaf extensions: replace the extended paths ───────────────
    // An attachment parent that IS a state leaf (⟺ its id is a state
    // path_id) stops being a leaf: its path's rows are superseded by
    // the extension's path under the new leaf id.
    val extended = attachParents
      .select(col("conv_id"), col("turn_id").as("path_id"))
      .join(m.select(col("conv_id"), col("path_id")).distinct(), Seq("conv_id", "path_id"), "left_semi")
      .localCheckpoint()
    val kept = m.join(broadcast(extended), Seq("conv_id", "path_id"), "left_anti")
    val deletedTrainTurns = m
      .join(broadcast(extended), Seq("conv_id", "path_id"), "left_semi")
      .filter(col("train"))
      .select(col("conv_id"), col("turn_id"))
    // ── first-visit flags ─────────────────────────────────────────
    // Recompute min(path_id) for exactly the turns whose membership
    // set changed; everyone else's set — hence minimum — is untouched.
    val affected = newRows
      .select(col("conv_id"), col("turn_id"))
      .unionByName(deletedTrainTurns)
      .distinct()
      .localCheckpoint()
    val all = kept
      .select(col("conv_id"), col("path_id"), col("pos"), col("turn_id"), col("train"))
      .unionByName(newRows.withColumn("train", lit(false)))
    val mins = all
      .join(broadcast(affected), Seq("conv_id", "turn_id"), "left_semi")
      .groupBy(col("conv_id"), col("turn_id"))
      .agg(min(col("path_id")).as("__first"))
    all
      .join(broadcast(mins), Seq("conv_id", "turn_id"), "left")
      .select(
        col("conv_id"),
        col("path_id"),
        col("pos"),
        col("turn_id"),
        when(col("__first").isNotNull, col("path_id") === col("__first"))
          .otherwise(col("train"))
          .as("train")
      )
  }
}
