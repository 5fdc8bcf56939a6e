package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConvTree

/** Branched-conversation tree flattening: hand fixture, a full
  * driver-side replay on random recursive trees (paths, positions,
  * first-visit flags), the per-turn trains-exactly-once invariant,
  * and the loud orphan/cycle integrity gates.
  */
class ConvTreeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-convtree-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private def turnsDf(rows: (Long, Long, Option[Long])*) =
    rows.toSeq
      .map { case (c, t, p) => (c, t, p.map(java.lang.Long.valueOf).orNull) }
      .toDF("conv_id", "turn_id", "parent_id")

  test("hand fixture: two paths share a prefix; the prefix trains on the smaller leaf only") {
    // 0 -> 1 -> 2 and 1 -> 3 (a regeneration): leaves {2, 3}.
    val out = ConvTree
      .treePaths(
        turnsDf((7L, 0L, None), (7L, 1L, Some(0L)), (7L, 2L, Some(1L)), (7L, 3L, Some(1L))),
        "conv_id",
        "turn_id",
        "parent_id"
      )
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (2L, 0L, 0L, true), (2L, 1L, 1L, true), (2L, 2L, 2L, true),
      (3L, 0L, 0L, false), (3L, 1L, 1L, false), (3L, 2L, 3L, true)
    ))
  }

  test("random recursive trees: full driver replay; every turn trains exactly once") {
    val rnd = new scala.util.Random(31137)
    // 5 conversations, each a random recursive tree of 20 turns
    val rows = (0 until 5).flatMap { c =>
      (0 until 20).map { t =>
        val id = c * 100L + t
        val parent = if (t == 0) None else Some(c * 100L + rnd.nextInt(t))
        (c.toLong, id, parent)
      }
    }
    val got = ConvTree
      .treePaths(turnsDf(rows: _*), "conv_id", "turn_id", "parent_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // driver replay
    val parent = rows.map(r => r._2 -> r._3).toMap
    val conv = rows.map(r => r._2 -> r._1).toMap
    val hasChild = rows.flatMap(_._3).toSet
    val leaves = rows.map(_._2).filterNot(hasChild)
    val paths = leaves.map { leaf =>
      var p = List(leaf)
      while (parent(p.head).isDefined) p = parent(p.head).get :: p
      leaf -> p
    }.toMap
    val firstLeaf = paths.toSeq
      .flatMap { case (leaf, p) => p.map(_ -> leaf) }
      .groupBy(_._1)
      .map { case (t, ls) => t -> ls.map(_._2).min }
    val expect = paths.toSeq.flatMap { case (leaf, p) =>
      p.zipWithIndex.map { case (t, i) =>
        (conv(t), leaf, i.toLong, t, firstLeaf(t) == leaf)
      }
    }.toSet
    assert(got.toSet == expect)
    // per-turn exactly-once
    got.groupBy(_._4).foreach { case (t, g) =>
      assert(g.count(_._5) == 1, s"turn $t must train exactly once")
    }
  }

  test("per-conversation-restarting turn ids: the closure never crosses conversations") {
    // The most common turn-store shape: ids number 0..n PER
    // conversation. A bare-turn-id closure would splice every
    // conversation's turn 1 onto every conversation's turn 0 (and the
    // orphan/cycle gates would all pass); conv-keyed joins must
    // instead produce each conversation's own paths, independently.
    //   conv 1: 0 -> 1 -> 2 and 1 -> 3   (two paths, shared prefix)
    //   conv 2: 0 -> 1                   (one chain)
    val out = ConvTree
      .treePaths(
        turnsDf(
          (1L, 0L, None), (1L, 1L, Some(0L)), (1L, 2L, Some(1L)), (1L, 3L, Some(1L)),
          (2L, 0L, None), (2L, 1L, Some(0L))
        ),
        "conv_id",
        "turn_id",
        "parent_id"
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, 2L, 0L, 0L, true), (1L, 2L, 1L, 1L, true), (1L, 2L, 2L, 2L, true),
      (1L, 3L, 0L, 0L, false), (1L, 3L, 1L, 1L, false), (1L, 3L, 2L, 3L, true),
      (2L, 1L, 0L, 0L, true), (2L, 1L, 1L, 1L, true)
    ))
    // per-(conv, turn) exactly-once, across BOTH conversations
    out.groupBy(r => (r._1, r._4)).foreach { case (k, g) =>
      assert(g.count(_._5) == 1, s"(conv, turn) $k must train exactly once")
    }
  }

  test("duplicated (conv, turn) keys are refused loudly") {
    val dup = turnsDf((1L, 0L, None), (1L, 1L, Some(0L)), (1L, 1L, Some(0L)))
    val e = intercept[IllegalArgumentException](
      ConvTree.treePaths(dup, "conv_id", "turn_id", "parent_id"))
    assert(e.getMessage.contains("not unique"), e.getMessage)
  }

  test("a cross-conversation parent pointer is refused as an orphan") {
    // conv 2's turn 1 points at an id that only exists in conv 1 —
    // the closure never crosses conversations, so this must fail
    // loudly instead of silently truncating conv 2's path.
    val cross = turnsDf((1L, 7L, None), (2L, 0L, None), (2L, 1L, Some(7L)))
    val e = intercept[IllegalArgumentException](
      ConvTree.treePaths(cross, "conv_id", "turn_id", "parent_id"))
    assert(e.getMessage.contains("orphan"), e.getMessage)
  }

  test("a single-turn conversation is its own one-row path") {
    val out = ConvTree
      .treePaths(turnsDf((9L, 5L, None)), "conv_id", "turn_id", "parent_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq((9L, 5L, 0L, 5L, true)))
  }

  test("a pure chain is one path, every turn training") {
    val out = ConvTree
      .treePaths(
        turnsDf((1L, 10L, None), (1L, 11L, Some(10L)), (1L, 12L, Some(11L))),
        "conv_id", "turn_id", "parent_id")
      .collect()
    assert(out.length == 3 && out.forall(_.getBoolean(4)))
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSet ==
      Set((0L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("tree_paths CLI verb lands the library's memberships") {
    val root = java.nio.file.Files.createTempDirectory("graft-tree-cli").toString
    val df = turnsDf((7L, 0L, None), (7L, 1L, Some(0L)), (7L, 2L, Some(1L)), (7L, 3L, Some(1L)))
    df.write.parquet(s"$root/turns")
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "tree_paths", "--turns", s"$root/turns",
      "--out", s"$root/paths"), spark)
    val got = spark.read.parquet(s"$root/paths")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    val lib = ConvTree.treePaths(df, "conv_id", "turn_id", "parent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(got == lib)
  }

  test("branchPairsRendered: the prompt is the root→parent path text, per conversation") {
    // conv 1:  0(u:"hi") -> 1(a:"ok", s=3)
    //                    -> 2(a:"meh", s=1)        pair at parent 0
    //          1 -> 3(u:"more") -> 4(a:"yes", s=9)
    //                           -> 5(a:"no", s=2)  pair at parent 3,
    //                              prompt = "hi ok more"
    // conv 2: same turn ids RESTART (conv-keying), one pair at its 0
    val turns = Seq(
      (1L, 0L, None, "user", "hi", 0L),
      (1L, 1L, Some(0L), "assistant", "ok", 3L),
      (1L, 2L, Some(0L), "assistant", "meh", 1L),
      (1L, 3L, Some(1L), "user", "more", 0L),
      (1L, 4L, Some(3L), "assistant", "yes", 9L),
      (1L, 5L, Some(3L), "assistant", "no", 2L),
      (2L, 0L, None, "user", "alt", 0L),
      (2L, 1L, Some(0L), "assistant", "a1", 7L),
      (2L, 2L, Some(0L), "assistant", "a2", 8L)
    ).map { case (c, t, p, r, x, s) => (c, t, p.map(java.lang.Long.valueOf).orNull, r, x, s) }
      .toDF("conv_id", "turn_id", "parent_id", "role", "content", "score")
    val got = graft.operators.ConvTree
      .branchPairsRendered(
        turns, "conv_id", "turn_id", "parent_id", "role", "content", "score", "assistant")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getString(5), r.getString(6), r.getLong(9))))
      .toMap
    assert(got == Map(
      (1L, 0L) -> (("hi", 1L, 2L, "ok", "meh", 2L)),
      (1L, 3L) -> (("hi ok more", 4L, 5L, "yes", "no", 7L)),
      (2L, 0L) -> (("alt", 2L, 1L, "a2", "a1", 1L))
    ))
  }

  test("branch_pairs CLI verb: both arms land the library's tables") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-bp-cli").toString
    val turns = Seq(
      (1L, 0L, null.asInstanceOf[java.lang.Long], "user", "hi", 0L),
      (1L, 1L, java.lang.Long.valueOf(0L), "assistant", "ok", 3L),
      (1L, 2L, java.lang.Long.valueOf(0L), "assistant", "meh", 1L)
    ).toDF("conv_id", "turn_id", "parent_id", "role", "content", "score")
    turns.write.parquet(s"$root/turns")
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "branch_pairs", "--turns", s"$root/turns",
      "--out", s"$root/pairs"), spark)
    val p = spark.read.parquet(s"$root/pairs").collect()
    assert(p.length == 1 && p.head.getAs[Long]("chosen_id") == 1L
      && p.head.getAs[Long]("rejected_id") == 2L)
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "branch_pairs", "--turns", s"$root/turns",
      "--out", s"$root/triples", "--render", "true"), spark)
    val t = spark.read.parquet(s"$root/triples").collect()
    assert(t.length == 1 && t.head.getAs[String]("prompt") == "hi"
      && t.head.getAs[String]("chosen") == "ok" && t.head.getAs[String]("rejected") == "meh")
    val lib = graft.operators.ConvTree.branchPairsRendered(
      turns, "conv_id", "turn_id", "parent_id", "role", "content", "score", "assistant")
    assert(spark.read.parquet(s"$root/triples")
      .select(lib.columns.map(col): _*)
      .collect().map(_.toSeq).toSet == lib.collect().map(_.toSeq).toSet)
  }

  test("dpo_release: triples -> conv-keyed purge -> verified shards, audited end to end") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-dpo-rel").toString
    // two convs with RESTARTING ids, each one sibling pair at parent 0;
    // conv 2's chosen turn (id 2) is planted as contaminated — note
    // conv 1 ALSO has a turn id 2 that must NOT be purged (conv-keyed)
    val turns = Seq(
      (1L, 0L, null.asInstanceOf[java.lang.Long], "user", "hi", 0L),
      (1L, 1L, java.lang.Long.valueOf(0L), "assistant", "ok", 3L),
      (1L, 2L, java.lang.Long.valueOf(0L), "assistant", "meh", 1L),
      (2L, 0L, null.asInstanceOf[java.lang.Long], "user", "yo", 0L),
      (2L, 1L, java.lang.Long.valueOf(0L), "assistant", "b1", 2L),
      (2L, 2L, java.lang.Long.valueOf(0L), "assistant", "b2", 6L)
    ).toDF("conv_id", "turn_id", "parent_id", "role", "content", "score")
    turns.write.parquet(s"$root/turns")
    Seq((2L, 2L)).toDF("conv_id", "turn_id").write.parquet(s"$root/bad")
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "dpo_release", "--turns", s"$root/turns",
      "--out", s"$root/rel", "--bad", s"$root/bad", "--shards", "2"), spark)
    // landed shards: conv 1's pair survives (its turn 2 is a DIFFERENT
    // conversation's id), conv 2's pair is purged via its chosen member
    val landed = spark.read.parquet(s"$root/rel/shards")
      .select(col("conv_id"), col("prompt"), col("chosen"), col("rejected"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(landed.toSeq == Seq((1L, "hi", "ok", "meh")))
    // the landing verified (verify_export ran by default); the audit
    // carries the landed counts
    val audit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/rel/_dpo_release.json")), "UTF-8")
    assert(audit.contains(""""pairs": 2""") && audit.contains(""""purged": 1""")
      && audit.contains(""""clean_pairs": 1""") && audit.contains(""""landed_rows": 1"""), audit)
    // a second release into the same root is refused up front
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "dpo_release", "--turns", s"$root/turns",
        "--out", s"$root/rel"), spark)
    }
    assert(e.getMessage.contains("triples"), e.getMessage)
    // and verify_export still passes on the landed shards standalone
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "verify_export", "--path", s"$root/rel/shards"), spark)
  }

  test("dpo_release --bpe_model + --eval: token coordinates, content purge, pinned audit") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-dpo-rel2").toString
    // conv 1 survives; conv 2's CHOSEN response verbatim-matches the
    // eval set (content purge, no pre-keyed verdict anywhere); conv 3
    // is purged via the pre-keyed --bad table — both purge arms in one
    // release, counted separately in the audit.
    val turns = Seq(
      (1L, 0L, null.asInstanceOf[java.lang.Long], "user", "hi there friend", 0L),
      (1L, 1L, java.lang.Long.valueOf(0L), "assistant", "ok good answer here", 3L),
      (1L, 2L, java.lang.Long.valueOf(0L), "assistant", "meh bad answer here", 1L),
      (2L, 0L, null.asInstanceOf[java.lang.Long], "user", "yo pal buddy", 0L),
      (2L, 1L, java.lang.Long.valueOf(0L), "assistant", "b one response text", 2L),
      (2L, 2L, java.lang.Long.valueOf(0L), "assistant", "secret eval answer leaked here", 6L),
      (3L, 0L, null.asInstanceOf[java.lang.Long], "user", "zz yy xx", 0L),
      (3L, 1L, java.lang.Long.valueOf(0L), "assistant", "c one text resp", 5L),
      (3L, 2L, java.lang.Long.valueOf(0L), "assistant", "c two text resp", 2L)
    ).toDF("conv_id", "turn_id", "parent_id", "role", "content", "score")
    turns.write.parquet(s"$root/turns")
    Seq((100L, "secret eval answer leaked here")).toDF("doc_id", "text")
      .write.parquet(s"$root/eval")
    Seq((3L, 1L)).toDF("conv_id", "turn_id").write.parquet(s"$root/bad")
    graft.operators.Bpe.buildModel(
      spark, turns.select(col("content")), "content", s"$root/model", numMerges = 4)
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "dpo_release", "--turns", s"$root/turns",
      "--out", s"$root/rel", "--shards", "2",
      "--bpe_model", s"$root/model", "--length_batches", "2",
      "--eval", s"$root/eval", "--bad", s"$root/bad"), spark)
    val landed = spark.read.parquet(s"$root/rel/shards")
    assert(landed.count() == 1L)
    val row = landed.collect().head
    assert(row.getAs[Long]("conv_id") == 1L && row.getAs[String]("chosen") == "ok good answer here")
    // token coordinates equal the library computation under the SAME
    // frozen model — the export counts in the tokenizer the trainer runs
    val merges = graft.operators.Bpe.loadMerges(spark, s"$root/model")
    val lib = graft.operators.Bpe
      .withModelTokenCounts(
        graft.operators.ConvTree.branchPairsRendered(
          turns.filter(col("conv_id") === 1L),
          "conv_id", "turn_id", "parent_id", "role", "content", "score", "assistant"),
        Seq("prompt", "chosen", "rejected"), merges)
      .collect().head
    Seq("prompt_toks", "chosen_toks", "rejected_toks").foreach { c =>
      assert(row.getAs[Long](c) == lib.getAs[Long](c) && row.getAs[Long](c) > 0L, c)
    }
    // the batch manifest ships next to the shards: the one clean pair
    // lands as batch 0 position 0 with its total model-token length
    val batches = spark.read.parquet(s"$root/rel/batches").collect()
    assert(batches.length == 1)
    val b = batches.head
    assert(b.getAs[Long]("conv_id") == 1L && b.getAs[Long]("batch_id") == 0L
      && b.getAs[Long]("pos_in_batch") == 0L
      && b.getAs[Long]("total_toks") ==
        lib.getAs[Long]("prompt_toks") + lib.getAs[Long]("chosen_toks") + lib.getAs[Long]("rejected_toks"))
    val audit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/rel/_dpo_release.json")), "UTF-8")
    assert(audit.contains(""""pairs": 3""") && audit.contains(""""purged_bad": 1""")
      && audit.contains(""""purged_eval": 1""") && audit.contains(""""clean_pairs": 1""")
      && audit.contains(""""bpe_model_version": 1""")
      && audit.contains(""""batch_size": 2""") && audit.contains(""""batches": 1""")
      && audit.contains(""""length_bias_slope_micro""""), audit)
    // --length_batches without --bpe_model is refused up front: the
    // layout sorts by model-token length, which needs the frozen table
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "dpo_release", "--turns", s"$root/turns",
        "--out", s"$root/rel_nb", "--length_batches", "2"), spark)
    }
    assert(e.getMessage.contains("bpe_model"), e.getMessage)
  }

  test("string ids: the walk keys and orders generically; first visit is UTF-8-min leaf") {
    // the operator is type-generic, and the walk compares leaf ids in
    // SQL order: numeric for numbers, UTF-8 code-point order for
    // strings — NOT Java's UTF-16 compareTo. The fixture's two leaves
    // make the orders disagree: U+FF21 FULLWIDTH A (one UTF-16 unit,
    // 0xFF21) vs U+1F600 (surrogate pair 0xD83D 0xDE00). UTF-16 unit
    // order puts the surrogate FIRST (0xD83D < 0xFF21); code-point
    // order puts the fullwidth A first (0xFF21 < 0x1F600). The
    // first-visit leaf must be the CODE-POINT minimum — what Spark
    // SQL's own string min computes.
    val lo = "Ａ" // U+FF21, code point 0xFF21
    val hi = "😀" // U+1F600, code point 0x1F600
    assert(lo.compareTo(hi) > 0, "fixture must make UTF-16 and code-point order disagree")
    val turns = Seq(
      ("c1", "a", null.asInstanceOf[String]),
      ("c1", "b", "a"),
      ("c1", lo, "b"),
      ("c1", hi, "b")
    ).toDF("conv_id", "turn_id", "parent_id")
    val got = ConvTree
      .treePaths(turns, "conv_id", "turn_id", "parent_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      ("c1", lo, 0L, "a", true), ("c1", lo, 1L, "b", true), ("c1", lo, 2L, lo, true),
      ("c1", hi, 0L, "a", false), ("c1", hi, 1L, "b", false), ("c1", hi, 2L, hi, true)
    ))
    // cross-check the first-visit minimum against Spark SQL's own min
    import org.apache.spark.sql.functions.min
    val sqlMin = turns.filter("turn_id IN ('Ａ', '😀')")
      .agg(min("turn_id")).head().getString(0)
    assert(sqlMin == lo)
  }

  test("integrity gates: orphaned parent and cycles fail loudly") {
    val orphan = turnsDf((1L, 0L, None), (1L, 1L, Some(99L)))
    val e1 = intercept[IllegalArgumentException](
      ConvTree.treePaths(orphan, "conv_id", "turn_id", "parent_id"))
    assert(e1.getMessage.contains("orphan"), e1.getMessage)
    // a cycle REACHABLE from a leaf loops the walk: the maxDepth guard fires
    val cyc = turnsDf((1L, 1L, Some(2L)), (1L, 2L, Some(1L)), (1L, 3L, Some(2L)))
    val e2 = intercept[IllegalArgumentException](
      ConvTree.treePaths(cyc, "conv_id", "turn_id", "parent_id", maxDepth = 20))
    assert(e2.getMessage.contains("cycle"), e2.getMessage)
    // a cyclic ISLAND (no leaf beneath it) would be silently omitted
    // by a leaf-rooted walk; the doubling closure covers ALL nodes,
    // so the same cycle guard refuses it uniformly
    val island = turnsDf((1L, 0L, None), (1L, 1L, Some(2L)), (1L, 2L, Some(1L)))
    val e3 = intercept[IllegalArgumentException](
      ConvTree.treePaths(island, "conv_id", "turn_id", "parent_id", maxDepth = 20))
    assert(e3.getMessage.contains("cycle"), e3.getMessage)
  }
}
