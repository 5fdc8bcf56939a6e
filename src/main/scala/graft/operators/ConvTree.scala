package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Branched-conversation trees → training paths. Real SFT corpora are
  * TREES, not chains: a user regenerates an answer, edits a message,
  * or the sampler fans out N continuations — every such event forks
  * the conversation, and the stored form is turns with PARENT
  * pointers. A trainer consumes root→leaf PATHS, but flattening every
  * path naively trains each shared prefix once PER LEAF under it —
  * systematically over-weighting early turns (the root trains
  * #leaves times). The fix shipped here is the first-visit rule:
  * every turn TRAINS on exactly one path — the one through its
  * smallest leaf id — and rides along mask-off everywhere else, so
  * the flattened corpus covers every turn exactly once while every
  * path stays structurally intact for context.
  *
  * Output: `(conv_id, path_id, pos, turn_id, train)` — one row per
  * (path, turn) membership, `path_id` = the path's leaf turn id,
  * `pos` the turn's 0-based position from the root, `train` the
  * first-visit flag. Compose with [[Preference.roleMaskIntervals]]
  * (rendered per path, the `train` flag AND the role filter) to get
  * token-space loss masks.
  *
  * Scale shape: leaves are an anti-join on the parent pointer; the
  * ancestor walk is an iterative frontier join (one keyed join +
  * `localCheckpoint` lineage cut per round, rounds = tree HEIGHT —
  * dialogue length, never corpus size), materializing the inherent
  * O(paths × depth) membership rows; the first-visit rule is one
  * turn-keyed min. No windows over anything corpus-sized; content
  * never enters this operator at all (structure only).
  *
  * Integrity: a non-null parent pointing at a missing turn fails
  * LOUDLY up front (the walk would silently treat the orphan as a
  * root and emit a truncated path); a parent cycle fails loudly via
  * the `maxDepth` round guard (the walk would otherwise never
  * terminate).
  */
object ConvTree {

  def treePaths(
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      parentCol: String,
      maxDepth: Int = 10000
  ): DataFrame = {
    require(maxDepth > 0, s"maxDepth must be positive, got $maxDepth")
    val t = turns.select(
      col(convCol).as("__conv"),
      col(turnCol).as("__turn"),
      col(parentCol).as("__parent")
    )
    // Loud integrity gate: every non-null parent must be a turn.
    val orphans = t
      .filter(col("__parent").isNotNull)
      .join(
        t.select(col("__turn").as("__parent")),
        Seq("__parent"),
        "left_anti"
      )
      .select(col("__turn"), col("__parent"))
      .limit(1)
      .collect()
    require(
      orphans.isEmpty,
      s"treePaths: turn ${orphans.headOption.map(_.get(0)).orNull} has parent " +
        s"${orphans.headOption.map(_.get(1)).orNull} which is not a turn — an orphaned " +
        "pointer would silently truncate its path at the orphan instead of the root"
    )
    // Leaves: turns no other turn points at.
    val leaves = t
      .join(
        t.filter(col("__parent").isNotNull).select(col("__parent").as("__turn")).distinct(),
        Seq("__turn"),
        "left_anti"
      )
      .select(col("__turn").as("__leaf"))
    val parentOf = t.select(col("__turn"), col("__parent"))
    // Ancestor walk: frontier = (leaf, current turn, distance-from-leaf).
    var frontier = leaves
      .select(col("__leaf"), col("__leaf").as("__at"), lit(0).as("__d"))
      .localCheckpoint()
    var acc = frontier
    var rounds = 0
    var more = frontier.limit(1).count() > 0
    while (more) {
      rounds += 1
      require(
        rounds <= maxDepth,
        s"treePaths: ancestor walk exceeded maxDepth=$maxDepth rounds — the parent " +
          "pointers contain a cycle (or raise maxDepth for genuinely deeper trees)"
      )
      frontier = frontier
        .join(parentOf, frontier("__at") === parentOf("__turn"))
        .filter(col("__parent").isNotNull)
        .select(col("__leaf"), col("__parent").as("__at"), (col("__d") + 1).as("__d"))
        .localCheckpoint()
      more = frontier.limit(1).count() > 0
      if (more) acc = acc.unionByName(frontier)
    }
    // Completeness gate: every turn must sit on at least one path. A
    // parent CYCLE with no leaf beneath it is unreachable from every
    // leaf, so the walk would otherwise just silently omit its turns
    // (and anything chained above them) from the flattened output.
    val unreached = t
      .join(acc.select(col("__at").as("__turn")).distinct(), Seq("__turn"), "left_anti")
      .select(col("__turn"))
      .limit(1)
      .collect()
    require(
      unreached.isEmpty,
      s"treePaths: turn ${unreached.headOption.map(_.get(0)).orNull} is on NO root→leaf " +
        "path — a parent cycle with no leaf beneath it (the walk starts at leaves, so a " +
        "cyclic island is unreachable); fix the parent pointers"
    )
    val pathLen = acc.groupBy(col("__leaf")).agg(max(col("__d")).as("__len"))
    val firstVisit = acc.groupBy(col("__at")).agg(min(col("__leaf")).as("__first_leaf"))
    acc
      .join(pathLen, Seq("__leaf"))
      .join(firstVisit, Seq("__at"))
      .join(t.select(col("__turn").as("__at"), col("__conv")), Seq("__at"))
      .select(
        col("__conv").as("conv_id"),
        col("__leaf").as("path_id"),
        (col("__len") - col("__d")).cast("long").as("pos"),
        col("__at").as("turn_id"),
        (col("__leaf") === col("__first_leaf")).as("train")
      )
  }
}
