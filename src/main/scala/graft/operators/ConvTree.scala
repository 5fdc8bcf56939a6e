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
  * (path, turn) membership, `path_id` = the path's leaf turn id
  * (unique WITHIN a conversation; `(conv_id, path_id)` is the global
  * path key), `pos` the turn's 0-based position from the root,
  * `train` the first-visit flag. Compose with
  * [[Preference.roleMaskIntervals]] (rendered per path, the `train`
  * flag AND the role filter) to get token-space loss masks.
  *
  * KEYING: every join — leaf anti-join, ancestor closure, first-visit
  * min — is keyed by `(conv, turn)`, so turn ids only need to be
  * unique WITHIN their conversation. The most common turn-store shape
  * numbers turns 0..n per conversation; a bare-turn-id closure would
  * silently splice every conversation's turn 1 onto every
  * conversation's turn 0 while all integrity gates pass. Parent
  * pointers must resolve within the SAME conversation (a cross-
  * conversation parent is refused as an orphan), and a duplicated
  * `(conv, turn)` row is refused up front — it would silently fan
  * out every closure join.
  *
  * Scale shape: leaves are an anti-join on the parent pointer; the
  * ancestor closure is built by POINTER DOUBLING — round k holds
  * every (descendant, ancestor, distance) pair with distance ≤ 2^k,
  * and one self-join on the middle node doubles the horizon — so the
  * round count is log₂(tree height), not height (a 1000-turn
  * dialogue closes in 10 rounds instead of 1000; each round is a
  * cluster synchronization barrier, which is exactly what log-depth
  * buys down). Each round is one keyed self-join + distinct +
  * `localCheckpoint` lineage cut. Closure SIZE is O(Σ per-node
  * depth): for bushy trees (many leaves) this is the same order as
  * the O(Σ path length) membership table being materialized, but on
  * a deep sparse CHAIN it is depth²/2 pairs per conversation while
  * the membership table is only depth rows — the price of log-depth
  * rounds, bounded by `maxDepth`² per conversation and partitioned by
  * the conv key (real dialogues are depth ≤ hundreds, so ≤ ~10⁵
  * closure rows per conversation; `maxDepth` is the loud guard
  * against a store that is secretly a million-turn chain). The
  * first-visit
  * rule is one turn-keyed min. No windows over anything
  * corpus-sized; content never enters this operator at all
  * (structure only).
  *
  * Integrity: a duplicated `(conv, turn)` key fails LOUDLY up front
  * (one O(turns) agg, the `requireNumericId` discipline); a non-null
  * parent pointing at a missing turn in its conversation fails
  * LOUDLY (the walk would silently treat the orphan as a root and
  * emit a truncated path); ANY parent cycle — leaf-reachable or an
  * isolated island — fails loudly via the doubling round guard (a
  * cycle makes distances unbounded, so the closure grows past the
  * `maxDepth` horizon); a belt-and-braces completeness gate refuses
  * any turn that lands on no path.
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
    // Loud uniqueness gate: (conv, turn) must be a key. A duplicate
    // would silently fan out every closure join below (duplicated
    // memberships, wrong train flags) — refuse it up front with one
    // O(turns) aggregate.
    val u = t
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("__conv"), col("__turn")).as("nd")
      )
      .collect()(0)
    require(
      u.getLong(0) == u.getLong(1),
      s"treePaths: ($convCol, $turnCol) is not unique — ${u.getLong(0)} rows but only " +
        s"${u.getLong(1)} distinct keys; a duplicated turn row would silently fan out " +
        "every path join. Deduplicate the turn store first."
    )
    // Loud integrity gate: every non-null parent must be a turn IN
    // THE SAME CONVERSATION (the closure never crosses conversations,
    // so a cross-conversation pointer is an orphan here by design).
    val orphans = t
      .filter(col("__parent").isNotNull)
      .join(
        t.select(col("__conv"), col("__turn").as("__parent")),
        Seq("__conv", "__parent"),
        "left_anti"
      )
      .select(col("__conv"), col("__turn"), col("__parent"))
      .limit(1)
      .collect()
    require(
      orphans.isEmpty,
      s"treePaths: turn ${orphans.headOption.map(_.get(1)).orNull} in conversation " +
        s"${orphans.headOption.map(_.get(0)).orNull} has parent " +
        s"${orphans.headOption.map(_.get(2)).orNull} which is not a turn of that " +
        "conversation — an orphaned pointer would silently truncate its path at the " +
        "orphan instead of the root"
    )
    // Leaves: turns no other turn (in the same conversation) points at.
    val leaves = t
      .join(
        t.filter(col("__parent").isNotNull)
          .select(col("__conv"), col("__parent").as("__turn"))
          .distinct(),
        Seq("__conv", "__turn"),
        "left_anti"
      )
      .select(col("__conv"), col("__turn").as("__leaf"))
    // Ancestor closure by pointer doubling: after round k, `cl` holds
    // every proper (conv, descendant, ancestor, distance) pair with
    // distance ≤ 2^k — in a tree each (desc, anc) pair has exactly
    // one distance, so the distinct is exact. A CYCLE makes distances
    // unbounded, so the closure would grow past every horizon: the
    // round guard (log₂ maxDepth + slack) converts that into a loud
    // failure instead of a runaway job.
    var cl = t
      .filter(col("__parent").isNotNull)
      .select(
        col("__conv"),
        col("__turn").as("__desc"),
        col("__parent").as("__anc"),
        lit(1L).as("__dist")
      )
      .localCheckpoint()
    val maxRounds =
      (64 - java.lang.Long.numberOfLeadingZeros(math.max(maxDepth.toLong - 1L, 1L))) + 1
    var rounds = 0
    var n = cl.count()
    var growing = n > 0
    while (growing) {
      rounds += 1
      require(
        rounds <= maxRounds,
        s"treePaths: ancestor closure still growing after $rounds doubling rounds " +
          s"(horizon 2^$rounds > maxDepth=$maxDepth) — the parent pointers contain a " +
          "cycle (or raise maxDepth for genuinely deeper trees)"
      )
      val a = cl.select(
        col("__conv"),
        col("__desc"),
        col("__anc").as("__mid"),
        col("__dist").as("__d1")
      )
      val b = cl.select(
        col("__conv"),
        col("__desc").as("__mid"),
        col("__anc"),
        col("__dist").as("__d2")
      )
      val doubled = a
        .join(b, Seq("__conv", "__mid"))
        .select(
          col("__conv"),
          col("__desc"),
          col("__anc"),
          (col("__d1") + col("__d2")).as("__dist")
        )
      val next = cl.unionByName(doubled).distinct().localCheckpoint()
      val n2 = next.count()
      growing = n2 > n
      cl = next
      n = n2
    }
    // Memberships: each leaf's own row at distance 0 plus its closure
    // ancestors — (__conv, __leaf, __at, __d) exactly as the linear
    // walk would emit them.
    val acc = leaves
      .select(col("__conv"), col("__leaf"), col("__leaf").as("__at"), lit(0L).as("__d"))
      .unionByName(
        cl.join(
          leaves.select(col("__conv"), col("__leaf").as("__desc")),
          Seq("__conv", "__desc")
        ).select(
          col("__conv"),
          col("__desc").as("__leaf"),
          col("__anc").as("__at"),
          col("__dist").as("__d")
        )
      )
    // Completeness gate: every turn must sit on at least one path. In
    // an acyclic forest every node has a descendant leaf, and the
    // doubling closure's round guard already refuses every cycle
    // (islands included — the closure covers ALL nodes, not just
    // leaf-reachable ones), so this is defense-in-depth: if a future
    // change ever lets a turn fall off every path, it fails HERE,
    // loudly, instead of silently shrinking the training corpus.
    val unreached = t
      .join(
        acc.select(col("__conv"), col("__at").as("__turn")).distinct(),
        Seq("__conv", "__turn"),
        "left_anti"
      )
      .select(col("__conv"), col("__turn"))
      .limit(1)
      .collect()
    require(
      unreached.isEmpty,
      s"treePaths: turn ${unreached.headOption.map(_.get(1)).orNull} in conversation " +
        s"${unreached.headOption.map(_.get(0)).orNull} is on NO root→leaf path — a " +
        "parent cycle with no leaf beneath it (the walk starts at leaves, so a cyclic " +
        "island is unreachable); fix the parent pointers"
    )
    val pathLen =
      acc.groupBy(col("__conv"), col("__leaf")).agg(max(col("__d")).as("__len"))
    val firstVisit =
      acc.groupBy(col("__conv"), col("__at")).agg(min(col("__leaf")).as("__first_leaf"))
    acc
      .join(pathLen, Seq("__conv", "__leaf"))
      .join(firstVisit, Seq("__conv", "__at"))
      .select(
        col("__conv").as("conv_id"),
        col("__leaf").as("path_id"),
        (col("__len") - col("__d")).cast("long").as("pos"),
        col("__at").as("turn_id"),
        (col("__leaf") === col("__first_leaf")).as("train")
      )
  }

  /** [[Preference.branchPairs]] RENDERED to trainer-ready text: each
    * sibling-regeneration pair with its textual PROMPT — the root→
    * parent path's contents in order (unique in a tree: a node's
    * ancestor chain does not depend on which leaf-path carries it) —
    * plus the chosen and rejected turns' contents. This is the DPO
    * export shape: `(prompt, chosen, rejected)` triples straight from
    * a branched turn store, where the branching itself encodes "same
    * prompt" and the path render encodes the full conversational
    * context the competing answers were sampled under.
    *
    * Output: `(conv_id, parent_id, prompt, chosen_id, rejected_id,
    * chosen, rejected, chosen_score, rejected_score, margin)`.
    *
    * Scale shape: [[Preference.branchPairs]]' one keyed agg, plus the
    * prompt render as a path-PREFIX read of [[treePaths]]: the
    * parent's FIRST-VISIT membership (unique per turn) anchors one
    * path, the prefix rows `pos ≤ parent pos` on that path ARE the
    * ancestor chain, and one (conv, parent)-keyed ordered agg joins
    * their contents — everything keyed, bounded by pairs × depth,
    * no self-join beyond the closure treePaths already builds.
    */
  def branchPairsRendered(
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      parentCol: String,
      roleCol: String,
      contentCol: String,
      scoreCol: String,
      respRole: String,
      maxDepth: Int = 10000
  ): DataFrame =
    branchPairsRenderedFrom(
      treePaths(turns, convCol, turnCol, parentCol, maxDepth),
      turns, convCol, turnCol, parentCol, roleCol, contentCol, scoreCol, respRole)

  /** [[branchPairsRendered]] against PRECOMPUTED memberships (`memb` in
    * [[treePaths]]' output shape) — the serving arm for a durable
    * [[TreeState]]: a campaign-scale turn store folds batches into the
    * membership state once and renders DPO triples per drain WITHOUT
    * re-running the pointer-doubling closure over the full store.
    * `memb` must cover `turns` (same store, state folded up to date) —
    * a parent missing its first-visit anchor drops its pairs, exactly
    * as a stale state should be caught by the state's own gates.
    */
  def branchPairsRenderedFrom(
      memb: DataFrame,
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      parentCol: String,
      roleCol: String,
      contentCol: String,
      scoreCol: String,
      respRole: String
  ): DataFrame = {
    val pairs = Preference.branchPairs(
      turns, convCol, turnCol, parentCol, roleCol, scoreCol, respRole)
    val content = turns.select(
      col(convCol).as("conv_id"),
      col(turnCol).as("turn_id"),
      col(contentCol).as("__content")
    )
    // the parent's unique first-visit membership anchors one path...
    val anchor = memb
      .filter(col("train"))
      .select(
        col("conv_id"),
        col("turn_id").as("parent_id"),
        col("path_id").as("__ppath"),
        col("pos").as("__ppos")
      )
      .join(pairs.select(col("conv_id"), col("parent_id")), Seq("conv_id", "parent_id"))
    // ...whose prefix rows are exactly the root→parent chain
    val prompt = memb
      .select(col("conv_id"), col("path_id").as("__ppath"), col("pos"), col("turn_id"))
      .join(anchor, Seq("conv_id", "__ppath"))
      .filter(col("pos") <= col("__ppos"))
      .join(content, Seq("conv_id", "turn_id"))
      .groupBy(col("conv_id"), col("parent_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("__content")))),
            x => x.getField("__content")
          ),
          " "
        ).as("prompt")
      )
    pairs
      .join(prompt, Seq("conv_id", "parent_id"))
      .join(
        content
          .select(col("conv_id"), col("turn_id").as("chosen_id"), col("__content").as("chosen")),
        Seq("conv_id", "chosen_id")
      )
      .join(
        content
          .select(col("conv_id"), col("turn_id").as("rejected_id"), col("__content").as("rejected")),
        Seq("conv_id", "rejected_id")
      )
      .select(
        col("conv_id"),
        col("parent_id"),
        col("prompt"),
        col("chosen_id"),
        col("rejected_id"),
        col("chosen"),
        col("rejected"),
        col("chosen_score"),
        col("rejected_score"),
        col("margin")
      )
  }

  /** [[treePaths]] joined back to the turns' content — the RENDER
    * input for a tree-aware SFT release: one row per (path, turn)
    * membership carrying the turn's role and content plus the
    * EFFECTIVE role `eff_role`, which is `trainRole` exactly when the
    * membership is BOTH first-visit (`train`) AND the turn's own role
    * is `trainRole`, and the sentinel `"context"` otherwise. Feeding
    * `(path, pos, eff_role, content)` into the flat SFT chain
    * (render → pack → [[Preference.roleMaskIntervals]] with
    * `eff_role`) therefore puts every train-role turn's tokens under
    * a KEEP-loss mask on EXACTLY ONE path — shared prefixes ride
    * along as context everywhere else — which is the whole point of
    * the first-visit rule.
    *
    * Output: `(conv_id, path_id, pos, turn_id, role, content, train,
    * eff_role)`. Content IS duplicated across the paths that share a
    * prefix (deliberately — the trainer needs it in-context); the
    * single-loss guarantee lives in `eff_role`, never in dropping
    * context. Scale shape: [[treePaths]] (structure only) plus ONE
    * (conv, turn)-keyed join that moves each turn's content once per
    * path membership — the same order as the table being produced.
    */
  def renderPaths(
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      parentCol: String,
      roleCol: String,
      contentCol: String,
      trainRole: String,
      maxDepth: Int = 10000
  ): DataFrame =
    renderPathsFrom(
      treePaths(turns, convCol, turnCol, parentCol, maxDepth),
      turns, convCol, turnCol, roleCol, contentCol, trainRole)

  /** [[renderPaths]] against PRECOMPUTED memberships (`memb` in
    * [[treePaths]]' output shape) — the serving arm for a durable
    * [[TreeState]], same contract as [[branchPairsRenderedFrom]]: the
    * state folds once per appended batch, and every render reads the
    * membership table instead of re-running the closure.
    */
  def renderPathsFrom(
      memb: DataFrame,
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      roleCol: String,
      contentCol: String,
      trainRole: String
  ): DataFrame = {
    require(
      trainRole != "context",
      "renderPaths: trainRole must not be the reserved sentinel 'context' — eff_role " +
        "could not distinguish first-visit train turns from ride-along context"
    )
    memb
      .join(
        turns.select(
          col(convCol).as("conv_id"),
          col(turnCol).as("turn_id"),
          col(roleCol).as("role"),
          col(contentCol).as("content")
        ),
        Seq("conv_id", "turn_id")
      )
      .select(
        col("conv_id"),
        col("path_id"),
        col("pos"),
        col("turn_id"),
        col("role"),
        col("content"),
        col("train"),
        when(col("train") && col("role") === trainRole, lit(trainRole))
          .otherwise(lit("context"))
          .as("eff_role")
      )
  }
}
