package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ConvTree, TreeState}

/** Durable tree-membership state: incremental folds must equal a
  * from-scratch treePaths replay after every append — random trees in
  * 3+ monotone batches, the leaf-extension case where the first-visit
  * flag MOVES to a sibling, the adversarial late-regeneration fork of
  * an old node (monotone and NON-monotone ids), new conversations
  * arriving mid-stream, the loud collision/orphan gates, exactly-once
  * replay, and the state-served render/pair verbs.
  */
class TreeStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-treestate-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private def turnsDf(rows: Seq[(Long, Long, Option[Long])]) =
    rows
      .map { case (c, t, p) => (c, t, p.map(java.lang.Long.valueOf).orNull) }
      .toDF("conv_id", "turn_id", "parent_id")

  private def rowsOf(df: DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet

  /** Fold `batches` one by one into a scratch state; after EACH fold
    * assert the state equals treePaths over everything folded so far.
    */
  private def foldAndCheck(batches: Seq[Seq[(Long, Long, Option[Long])]]): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate").toString
    try {
      val state = s"$root/tree"
      batches.zipWithIndex.foldLeft(Seq.empty[(Long, Long, Option[Long])]) {
        case (sofar, (batch, i)) =>
          TreeState.fold(
            spark, turnsDf(batch), "conv_id", "turn_id", "parent_id", state, Some(i.toLong))
          val all = sofar ++ batch
          val want = rowsOf(ConvTree.treePaths(turnsDf(all), "conv_id", "turn_id", "parent_id"))
          val got = rowsOf(TreeState.memberships(spark, state))
          assert(got == want, s"after fold $i: state diverges from from-scratch replay")
          all
      }
      ()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("random recursive trees in 3 monotone appends equal the from-scratch replay each time") {
    val rnd = new scala.util.Random(4711)
    // 4 conversations × 24 turns, parents random earlier turns (so
    // batches carry multi-level subtrees, extensions, and forks);
    // conv 3 only APPEARS in batch 2 (a new conversation mid-stream).
    val rows = (0 until 4).flatMap { c =>
      (0 until 24).map { t =>
        val id = c * 1000L + t
        val parent = if (t == 0) None else Some(c * 1000L + rnd.nextInt(t))
        (c.toLong, id, parent)
      }
    }
    def slice(c: Long, lo: Int, hi: Int) =
      rows.filter(r => r._1 == c && (r._2 % 1000) >= lo && (r._2 % 1000) < hi)
    val batch0 = (0L until 3L).flatMap(c => slice(c, 0, 10))
    val batch1 = (0L until 3L).flatMap(c => slice(c, 10, 17))
    val batch2 = (0L until 4L).flatMap(c => slice(c, if (c == 3L) 0 else 17, 24))
    foldAndCheck(Seq(batch0, batch1, batch2))
  }

  test("leaf extension MOVES the first-visit flag to the surviving smaller sibling leaf") {
    // 0 -> 1 -> {5, 7}: turns 0 and 1 first-visit on path 5. Extending
    // leaf 5 with 100 deletes path 5; their minimum must move to 7
    // (the surviving old leaf), while 5 itself moves to its extension.
    val b0 = Seq((1L, 0L, None), (1L, 1L, Some(0L)), (1L, 5L, Some(1L)), (1L, 7L, Some(1L)))
      .asInstanceOf[Seq[(Long, Long, Option[Long])]]
    val b1 = Seq((1L, 100L, Option(5L)))
    foldAndCheck(Seq(b0, b1))
    // and pin the exact semantics once, independent of the replay
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-ext").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state, Some(0L))
      TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(1L))
      val got = rowsOf(TreeState.memberships(spark, state))
      assert(got == Set(
        (1L, 7L, 0L, 0L, true), (1L, 7L, 1L, 1L, true), (1L, 7L, 2L, 7L, true),
        (1L, 100L, 0L, 0L, false), (1L, 100L, 1L, 1L, false),
        (1L, 100L, 2L, 5L, true), (1L, 100L, 3L, 100L, true)
      ))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("late regeneration forks an OLD interior node: one path added, old flags untouched") {
    // chain 0 -> 1 -> 2; a much later batch regenerates under the
    // interior node 1 (the adversarial shape: the fork lands on a node
    // whose subtree was long settled) — one new path through the old
    // 0 -> 1 prefix, every old flag stable (new leaf id is larger).
    val b0 = Seq((9L, 0L, None), (9L, 1L, Some(0L)), (9L, 2L, Some(1L)))
      .asInstanceOf[Seq[(Long, Long, Option[Long])]]
    val b1 = Seq((9L, 50L, Option(1L)), (9L, 51L, Option(50L)))
    foldAndCheck(Seq(b0, b1))
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-fork").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state, Some(0L))
      val before = rowsOf(TreeState.memberships(spark, state))
      TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(1L))
      val after = rowsOf(TreeState.memberships(spark, state))
      assert(before.subsetOf(after), "the settled path-2 rows must survive byte-identical")
      assert(after -- before == Set(
        (9L, 51L, 0L, 0L, false), (9L, 51L, 1L, 1L, false),
        (9L, 51L, 2L, 50L, true), (9L, 51L, 3L, 51L, true)
      ))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("NON-monotone fork: a new leaf with a SMALLER id steals the first-visit minimum") {
    // ids need not grow: a fork under old node 10 arrives with leaf id
    // 3 < the settled leaf 12 — the fold must move 10's (and the
    // root's) first-visit to the new smaller path key, exactly as the
    // from-scratch replay does.
    val b0 = Seq((2L, 10L, None), (2L, 11L, Some(10L)), (2L, 12L, Some(11L)))
      .asInstanceOf[Seq[(Long, Long, Option[Long])]]
    val b1 = Seq((2L, 3L, Option(10L)))
    foldAndCheck(Seq(b0, b1))
  }

  test("a batch extending a leaf with a multi-turn subtree (chain + fork inside the batch)") {
    val b0 = Seq((5L, 0L, None), (5L, 1L, Some(0L)))
      .asInstanceOf[Seq[(Long, Long, Option[Long])]]
    // batch: 1 -> 2 -> {3, 4} — extends leaf 1, two new paths
    val b1 = Seq((5L, 2L, Option(1L)), (5L, 3L, Option(2L)), (5L, 4L, Option(2L)))
    foldAndCheck(Seq(b0, b1))
  }

  test("exactly-once: replaying an applied batch is a no-op; a new applied_id is refused as a collision") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-once").toString
    try {
      val state = s"$root/tree"
      val b0 = Seq((1L, 0L, None), (1L, 1L, Some(0L)))
        .asInstanceOf[Seq[(Long, Long, Option[Long])]]
      val b1 = Seq((1L, 2L, Option(1L)))
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state, Some(0L))
      TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(1L))
      val after = rowsOf(TreeState.memberships(spark, state))
      // replay of batch 1 under its applied id: no-op
      TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(1L))
      assert(rowsOf(TreeState.memberships(spark, state)) == after)
      // the same rows under a NEW id are a key collision — loud
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(2L))
      }
      assert(e.getMessage.contains("already exists"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("segmented layout: untouched buckets are NOT rewritten; _buckets pins the partition count") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-seg").toString
    try {
      val state = s"$root/tree"
      // convs 0..7 across 8 buckets; batch 1 touches conv 0 ONLY
      val b0 = (0L until 8L).flatMap(c => Seq((c, 0L, Option.empty[Long]), (c, 1L, Option(0L))))
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state,
        Some(0L), 10000, 8)
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(new String(fs.open(new org.apache.hadoop.fs.Path(s"$state/_buckets")).readAllBytes(),
        "UTF-8").trim == "8")
      val segs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cv="))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
      assert(segs.size > 1, s"8 convs should spread over >1 of 8 buckets: ${segs.keys}")
      Thread.sleep(1100) // fs mtime granularity
      // second fold: one conv — exactly the buckets of conv 0 rewritten
      TreeState.fold(spark, turnsDf(Seq((0L, 2L, Option(1L)))),
        "conv_id", "turn_id", "parent_id", state, Some(1L), 10000, 999 /* ignored: pinned */)
      val after = fs.listStatus(new org.apache.hadoop.fs.Path(state))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cv="))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
      val rewritten = after.filter { case (n, t) => segs.get(n).exists(_ != t) }.keySet
      assert(rewritten.size == 1, s"exactly conv 0's bucket must be rewritten, got $rewritten")
      // and the fold is still exactly the replay
      assert(rowsOf(TreeState.memberships(spark, state)) ==
        rowsOf(ConvTree.treePaths(turnsDf(b0 :+ ((0L, 2L, Option(1L)))),
          "conv_id", "turn_id", "parent_id")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("segmented convergence: a half-applied fold (root marker lost) retries to the exact replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-conv").toString
    try {
      val state = s"$root/tree"
      val b0 = (0L until 6L).flatMap(c => Seq((c, 0L, Option.empty[Long]), (c, 1L, Option(0L))))
      val b1 = (0L until 6L).map(c => (c, 2L, Option(1L)))
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state,
        Some(0L), 10000, 4)
      TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(1L))
      val want = rowsOf(TreeState.memberships(spark, state))
      // simulate a crash AFTER every bucket swapped but BEFORE the root
      // marker advanced: delete the root marker and retry the batch —
      // the per-bucket _seg_applied markers must skip every bucket
      // (re-folding them would fire the collision gate)
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$state/_applied_id"), false)
      TreeState.fold(spark, turnsDf(b1), "conv_id", "turn_id", "parent_id", state, Some(1L))
      assert(rowsOf(TreeState.memberships(spark, state)) == want)
      // simulate a crash stranded BETWEEN a bucket's two renames: move
      // one bucket to the old dir (target missing) — entry healing must
      // restore it before the next fold reads the state
      val seg = fs.listStatus(new org.apache.hadoop.fs.Path(state))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cv=")).head.getPath
      val oldRoot = new org.apache.hadoop.fs.Path(s"$state.__fold_old")
      fs.mkdirs(oldRoot)
      fs.rename(seg, new org.apache.hadoop.fs.Path(oldRoot, seg.getName))
      TreeState.fold(spark, turnsDf(Seq((0L, 3L, Option(2L)))),
        "conv_id", "turn_id", "parent_id", state, Some(2L))
      assert(rowsOf(TreeState.memberships(spark, state)) ==
        rowsOf(ConvTree.treePaths(turnsDf(b0 ++ b1 :+ ((0L, 3L, Option(2L)))),
          "conv_id", "turn_id", "parent_id")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("reshard: memberships survive a bucket re-pin; folds continue; crash mid-swap heals") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-reshard").toString
    try {
      val state = s"$root/tree"
      val b0 = (0L until 6L).flatMap(c => Seq((c, 0L, Option.empty[Long]), (c, 1L, Option(0L))))
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state,
        Some(0L), 10000, 8)
      val before = rowsOf(TreeState.memberships(spark, state))
      TreeState.reshard(spark, state, 3)
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(new String(fs.open(new org.apache.hadoop.fs.Path(s"$state/_buckets")).readAllBytes(),
        "UTF-8").trim == "3")
      assert(rowsOf(TreeState.memberships(spark, state)) == before)
      assert(TreeState.report(spark, state).forall { case (s, bytes) => s < 3 && bytes > 0L })
      // a fold keeps working under the new pin (its buckets param is ignored)
      TreeState.fold(spark, turnsDf(Seq((0L, 2L, Option(1L)))),
        "conv_id", "turn_id", "parent_id", state, Some(1L), 10000, 999)
      assert(rowsOf(TreeState.memberships(spark, state)) ==
        rowsOf(ConvTree.treePaths(turnsDf(b0 :+ ((0L, 2L, Option(1L)))),
          "conv_id", "turn_id", "parent_id")))
      val after = rowsOf(TreeState.memberships(spark, state))
      // crash stranded between the reshard's two whole-root renames:
      // root gone, old holds the state — the next fold must heal first
      fs.rename(new org.apache.hadoop.fs.Path(state),
        new org.apache.hadoop.fs.Path(s"$state.__reshard_old"))
      TreeState.fold(spark, turnsDf(Seq((0L, 3L, Option(2L)))),
        "conv_id", "turn_id", "parent_id", state, Some(2L))
      assert(rowsOf(TreeState.memberships(spark, state)).size > after.size)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("reshard / report / memberships heal a crashed fold's stranded bucket first") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-heal").toString
    try {
      val state = s"$root/tree"
      val b0 = (0L until 6L).flatMap(c => Seq((c, 0L, Option.empty[Long]), (c, 1L, Option(0L))))
      TreeState.fold(spark, turnsDf(b0), "conv_id", "turn_id", "parent_id", state,
        Some(0L), 10000, 4)
      val want = rowsOf(TreeState.memberships(spark, state))
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val allBuckets = TreeState.report(spark, state).map(_._1).toSet
      def strandOneBucket(): Unit = {
        val seg = fs.listStatus(new org.apache.hadoop.fs.Path(state))
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("cv=")).head.getPath
        val oldRoot = new org.apache.hadoop.fs.Path(s"$state.__fold_old")
        fs.mkdirs(oldRoot)
        fs.rename(seg, new org.apache.hadoop.fs.Path(oldRoot, seg.getName))
      }
      // memberships() heals: a reader after a crashed fold must not
      // silently omit the stranded bucket's rows
      strandOneBucket()
      assert(rowsOf(TreeState.memberships(spark, state)) == want)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state.__fold_old")))
      // report() heals: sizing must cover every bucket
      strandOneBucket()
      assert(TreeState.report(spark, state).map(_._1).toSet == allBuckets)
      // reshard() heals BEFORE re-hashing: without it the re-bucketed
      // state would persist the stranded bucket's loss, and the next
      // fold's healing would rename the stale backup into the re-hashed
      // root, corrupting bucket pruning
      strandOneBucket()
      TreeState.reshard(spark, state, 2)
      assert(rowsOf(TreeState.memberships(spark, state)) == want)
      assert(TreeState.report(spark, state).map(_._1).toSet == Set(0, 1))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("empty first batch: typed empty state, no wedge on retry, later folds proceed") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-empty").toString
    try {
      val state = s"$root/tree"
      val empty = turnsDf(Seq.empty)
      // first drain is empty: the root lands with its markers but no
      // cv= dirs — memberships must be a TYPED empty table, not a
      // parquet schema-inference failure
      val m0 = TreeState.fold(spark, empty, "conv_id", "turn_id", "parent_id", state, Some(0L))
      assert(m0.collect().isEmpty)
      assert(m0.columns.toSeq == Seq("conv_id", "path_id", "pos", "turn_id", "train"))
      // an at-least-once RETRY of the applied empty batch (the wedge
      // case: the short-circuit used to re-read a data-less root)
      assert(TreeState.fold(
        spark, empty, "conv_id", "turn_id", "parent_id", state, Some(0L)).collect().isEmpty)
      assert(TreeState.memberships(spark, state).collect().isEmpty)
      assert(TreeState.report(spark, state).isEmpty)
      // a reshard of the data-less state just re-pins the bucket count
      TreeState.reshard(spark, state, 2)
      // and real folds proceed against the (re-pinned) empty state
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None), (1L, 1L, Option(0L)))),
        "conv_id", "turn_id", "parent_id", state, Some(1L))
      assert(rowsOf(TreeState.memberships(spark, state)) ==
        rowsOf(ConvTree.treePaths(turnsDf(Seq((1L, 0L, None), (1L, 1L, Option(0L)))),
          "conv_id", "turn_id", "parent_id")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("a completely empty root dir (crash before the pin write) folds as a fresh state") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-bare").toString
    try {
      val state = s"$root/tree"
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(state))
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(0L))
      assert(rowsOf(TreeState.memberships(spark, state)) == Set((1L, 0L, 0L, 0L, true)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("legacy unsegmented state layout is refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-legacy").toString
    try {
      val state = s"$root/tree"
      // a pre-segmentation state: bare parquet at the root, no _buckets
      turnsDf(Seq((1L, 0L, None))).write.parquet(state)
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(Seq((1L, 1L, Option(0L)))),
          "conv_id", "turn_id", "parent_id", state, Some(1L))
      }
      assert(e.getMessage.contains("rebuild"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("orphan gates: a batch parent resolving to neither state nor batch is refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-orphan").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(
        spark,
        turnsDf(Seq((1L, 0L, None), (1L, 1L, Some(0L)))),
        "conv_id", "turn_id", "parent_id", state, Some(0L))
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(
          spark, turnsDf(Seq((1L, 9L, Some(99L)))),
          "conv_id", "turn_id", "parent_id", state, Some(1L))
      }
      assert(e.getMessage.contains("orphan"), e.getMessage)
      // cross-conversation pointer: turn 1 exists in conv 1, not conv 2
      val e2 = intercept[IllegalArgumentException] {
        TreeState.fold(
          spark, turnsDf(Seq((2L, 9L, Some(1L)))),
          "conv_id", "turn_id", "parent_id", state, Some(1L))
      }
      assert(e2.getMessage.contains("orphan"), e2.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("tree_state CLI verb + state-served tree_render and branch_pairs equal the closure path") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-cli").toString
    try {
      val allRows = Seq(
        (1L, 0L, Option.empty[Long], "user", "hi", 0L),
        (1L, 1L, Some(0L), "assistant", "ok", 3L),
        (1L, 2L, Some(0L), "assistant", "meh", 1L),
        (1L, 3L, Some(1L), "user", "more", 0L),
        (1L, 4L, Some(3L), "assistant", "yes", 9L),
        (1L, 5L, Some(3L), "assistant", "no", 2L)
      )
      def df(rows: Seq[(Long, Long, Option[Long], String, String, Long)]) =
        rows
          .map { case (c, t, p, r, x, s) => (c, t, p.map(java.lang.Long.valueOf).orNull, r, x, s) }
          .toDF("conv_id", "turn_id", "parent_id", "role", "content", "score")
      val turns = df(allRows)
      turns.write.parquet(s"$root/turns")
      // fold in two batches through the verb
      df(allRows.take(3)).write.parquet(s"$root/b0")
      df(allRows.drop(3)).write.parquet(s"$root/b1")
      for ((b, i) <- Seq("b0", "b1").zipWithIndex)
        graft.pipeline.PipelineRunner.run(Array(
          "--maintenance", "tree_state", "--batch", s"$root/$b",
          "--state", s"$root/tree", "--applied_id", i.toString), spark)
      assert(rowsOf(TreeState.memberships(spark, s"$root/tree")) ==
        rowsOf(ConvTree.treePaths(turns, "conv_id", "turn_id", "parent_id")))
      // reshard + report verbs: memberships survive the re-pin
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "tree_state_reshard", "--state", s"$root/tree",
        "--buckets", "5"), spark)
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "tree_state_report", "--state", s"$root/tree"), spark)
      assert(rowsOf(TreeState.memberships(spark, s"$root/tree")) ==
        rowsOf(ConvTree.treePaths(turns, "conv_id", "turn_id", "parent_id")))
      // tree_render --paths_state ≡ tree_render (closure)
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "tree_render", "--turns", s"$root/turns",
        "--out", s"$root/r_state", "--paths_state", s"$root/tree"), spark)
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "tree_render", "--turns", s"$root/turns",
        "--out", s"$root/r_closure"), spark)
      def rset(p: String) = spark.read.parquet(p)
        .drop("doc_id") // the dense path rank is order-assigned; compare content
        .collect().map(_.toSeq).toSet
      assert(rset(s"$root/r_state") == rset(s"$root/r_closure"))
      // branch_pairs --render --paths_state ≡ the closure render
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "branch_pairs", "--turns", s"$root/turns",
        "--out", s"$root/p_state", "--render", "true",
        "--paths_state", s"$root/tree"), spark)
      val wantPairs = ConvTree.branchPairsRendered(
        turns, "conv_id", "turn_id", "parent_id", "role", "content", "score", "assistant")
      assert(spark.read.parquet(s"$root/p_state")
        .select(wantPairs.columns.map(col): _*).collect().map(_.toSeq).toSet ==
        wantPairs.collect().map(_.toSeq).toSet)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("random STRING-keyed trees in 3 appends equal the from-scratch replay each time") {
    // the generic-id path end-to-end through the DURABLE state: random
    // recursive trees keyed by string conv/turn ids (UUID-ish stores),
    // folded in three appends — after each fold the persisted
    // memberships must equal the from-scratch walk, exercising the
    // _idtypes sidecar, the string-typed empty path, and the walk's
    // code-point first-visit minimum over non-numeric path keys
    val rnd = new scala.util.Random(1337)
    def sid(c: Int, t: Int) = f"c$c%02d-t$t%03d"
    val rows = (0 until 3).flatMap { c =>
      (0 until 18).map { t =>
        val parent = if (t == 0) null else sid(c, rnd.nextInt(t))
        (s"conv-$c", sid(c, t), parent)
      }
    }
    def df(sel: ((String, String, String)) => Boolean) =
      rows.filter(sel).toDF("conv_id", "turn_id", "parent_id")
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-strrand").toString
    try {
      val state = s"$root/tree"
      val cuts = Seq(0 to 7, 8 to 12, 13 to 17)
      cuts.zipWithIndex.foldLeft(Set.empty[(String, String, String)]) {
        case (sofar, (range, i)) =>
          val inBatch = rows.filter(r => range.contains(r._2.drop(5).toInt)).toSet
          TreeState.fold(
            spark, df(inBatch), "conv_id", "turn_id", "parent_id", state, Some(i.toLong),
            buckets = 4)
          val all = sofar ++ inBatch
          def setOf(d: org.apache.spark.sql.DataFrame) = d.collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
            .toSet
          val want = setOf(ConvTree.treePaths(df(all), "conv_id", "turn_id", "parent_id"))
          val got = setOf(TreeState.memberships(spark, state))
          assert(got == want, s"after string-id fold $i: state diverges from the walk")
          all
      }
      ()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("single-writer fence: a concurrent fold under a live lease is refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-lease").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(0L))
      // simulate a LIVE writer (fold id 1 mid-flight): plant its lease
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$state.__writer"), "fold:1")
      // a DIFFERENT writer (the double-fired scheduler racing a manual
      // verb) must refuse loudly, leaving the state untouched
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(Seq((1L, 9L, Option(0L)))),
          "conv_id", "turn_id", "parent_id", state, Some(2L))
      }
      assert(e.getMessage.contains("writer lease"), e.getMessage)
      assert(rowsOf(TreeState.memberships(spark, state)) == Set((1L, 0L, 0L, 0L, true)))
      // reshard under the same live lease: refused too
      val e2 = intercept[IllegalArgumentException] {
        TreeState.reshard(spark, state, 4)
      }
      assert(e2.getMessage.contains("writer lease"), e2.getMessage)
      // the crashed writer's RETRY (same applied id → same token)
      // re-enters, completes, and releases the lease
      TreeState.fold(spark, turnsDf(Seq((1L, 1L, Option(0L)))),
        "conv_id", "turn_id", "parent_id", state, Some(1L))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$state.__writer")))
      assert(rowsOf(TreeState.memberships(spark, state)) ==
        rowsOf(ConvTree.treePaths(
          turnsDf(Seq((1L, 0L, None), (1L, 1L, Option(0L)))),
          "conv_id", "turn_id", "parent_id")))
      // and a gate FAILURE releases the lease (no wedge): an in-batch
      // duplicate key refuses the fold but frees the next writer
      intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(Seq((1L, 7L, Option(0L)), (1L, 7L, Option(1L)))),
          "conv_id", "turn_id", "parent_id", state, Some(2L))
      }
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$state.__writer")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("readers refuse to heal swap leftovers under a live lease; read normally otherwise") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-readlease").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(0L))
      // live lease + NOTHING stranded: reads proceed (concurrent reads
      // during a fold see a complete pre- or post-swap state)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$state.__writer"), "fold:1")
      assert(rowsOf(TreeState.memberships(spark, state)) == Set((1L, 0L, 0L, 0L, true)))
      // live lease + a fabricated mid-swap leftover: ambiguous (live
      // writer mid-swap vs crashed) — healing's renames must not race
      // the writer, so the read refuses loudly
      new java.io.File(s"$state.__fold_old/cv=0").mkdirs()
      val e = intercept[IllegalArgumentException] {
        TreeState.memberships(spark, state)
      }
      assert(e.getMessage.contains("refusing to heal under a lease"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] { TreeState.report(spark, state) }
      assert(e2.getMessage.contains("refusing to heal under a lease"), e2.getMessage)
      // lease gone (writer finished/cleared): the reader heals and reads
      java.nio.file.Files.delete(java.nio.file.Paths.get(s"$state.__writer"))
      assert(rowsOf(TreeState.memberships(spark, state)) == Set((1L, 0L, 0L, 0L, true)))
      assert(!new java.io.File(s"$state.__fold_old").exists(), "leftover healed away")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("applied ids must be monotone: an OLDER id is refused with the delivery diagnosis") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-mono").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(5L))
      // replay of the LAST id: no-op (the exactly-once contract)
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(5L))
      // an OLDER id is an out-of-order delivery, not a replay
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(Seq((1L, 1L, Option(0L)))),
          "conv_id", "turn_id", "parent_id", state, Some(3L))
      }
      assert(e.getMessage.contains("strictly increase"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("id-type contract is mechanical: a drifting batch fails loudly at the fold boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-idt").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(0L))
      // an INT-typed batch onto the long state: refused at entry (the
      // old behavior was a silent unionByName widening into an opaque
      // encoder ClassCastException inside the walk)
      val intBatch = Seq((1, 1, Option(0)))
        .map { case (c, t, p) => (c, t, p.map(java.lang.Integer.valueOf).orNull) }
        .toDF("conv_id", "turn_id", "parent_id")
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(spark, intBatch, "conv_id", "turn_id", "parent_id", state, Some(1L))
      }
      assert(e.getMessage.contains("id types"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("string-keyed store: the empty-first-batch state serves a STRING-typed empty table") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-stridt").toString
    try {
      val state = s"$root/tree"
      val empty = Seq.empty[(String, String, String)]
        .toDF("conv_id", "turn_id", "parent_id")
      TreeState.fold(spark, empty, "conv_id", "turn_id", "parent_id", state, Some(0L))
      // the markers-only root now serves the STATE's pinned types, so a
      // later string batch folds cleanly through the typed empty path
      val m = TreeState.memberships(spark, state)
      assert(m.schema("conv_id").dataType == org.apache.spark.sql.types.StringType)
      assert(m.schema("turn_id").dataType == org.apache.spark.sql.types.StringType)
      val b1 = Seq(("c", "r", null: String), ("c", "x", "r"))
        .toDF("conv_id", "turn_id", "parent_id")
      TreeState.fold(spark, b1, "conv_id", "turn_id", "parent_id", state, Some(1L))
      val got = TreeState.memberships(spark, state)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getBoolean(4))).toSet
      assert(got == Set(("c", "x", 0L, "r", true), ("c", "x", 1L, "x", true)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("fold-context duplicate keys name the BATCH as the remedy, not the turn store") {
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-dupmsg").toString
    try {
      val state = s"$root/tree"
      TreeState.fold(spark, turnsDf(Seq((1L, 0L, None))),
        "conv_id", "turn_id", "parent_id", state, Some(0L))
      val e = intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(Seq((1L, 7L, Option(0L)), (1L, 7L, Option(0L)))),
          "conv_id", "turn_id", "parent_id", state, Some(1L))
      }
      assert(e.getMessage.contains("appended batch"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("maxConvRows: a secretly-huge conversation fails with a diagnosis, not an OOM") {
    // all rows share one conv key (the null/default-key collapse the
    // guard exists to name) — at maxConvRows=10 the walk refuses
    val rows = (0L until 40L).map(t => (1L, t, if (t == 0) None else Some(t - 1)))
    val e = intercept[IllegalArgumentException] {
      ConvTree.treePaths(
        turnsDf(rows), "conv_id", "turn_id", "parent_id", maxConvRows = 10).count()
    }
    assert(e.getMessage.contains("maxConvRows"), e.getMessage)
    val root = java.nio.file.Files.createTempDirectory("graft-treestate-mcr").toString
    try {
      val state = s"$root/tree"
      val e2 = intercept[IllegalArgumentException] {
        TreeState.fold(spark, turnsDf(rows), "conv_id", "turn_id", "parent_id", state,
          Some(0L), maxConvRows = 10)
      }
      assert(e2.getMessage.contains("maxConvRows"), e2.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("releasingScratchPins: a second concurrent boundary on one session is refused") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val inner = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try graft.operators.Maintenance.releasingScratchPins(spark) {
        entered.countDown()
        gate.await()
      } catch { case e: Throwable => inner.set(e); entered.countDown() })
    t.start()
    entered.await()
    try {
      val e = intercept[IllegalStateException] {
        graft.operators.Maintenance.releasingScratchPins(spark)(())
      }
      assert(e.getMessage.contains("scratch-pin boundary"), e.getMessage)
    } finally {
      gate.countDown()
      t.join()
    }
    assert(inner.get() == null)
    // same-thread NESTING stays legal (outer verb wrapping inner operators)
    graft.operators.Maintenance.releasingScratchPins(spark) {
      graft.operators.Maintenance.releasingScratchPins(spark)(())
    }
    // and after release, a fresh boundary enters cleanly
    graft.operators.Maintenance.releasingScratchPins(spark)(())
  }
}
