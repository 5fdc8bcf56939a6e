package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

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
  * KEYING: the walk groups by the conv key and resolves parents only
  * within the group, so turn ids only need to be unique WITHIN their
  * conversation. The most common turn-store shape numbers turns 0..n
  * per conversation; a bare-turn-id walk would silently splice every
  * conversation's turn 1 onto every conversation's turn 0 while all
  * integrity gates pass. Parent pointers must resolve within the SAME
  * conversation (a cross-conversation parent is refused as an
  * orphan), and a duplicated `(conv, turn)` row is refused up front —
  * it would silently corrupt the parent map.
  *
  * Scale shape: every effect is CONVERSATION-LOCAL (paths never cross
  * conversations), so the whole flatten is ONE hash
  * exchange on the conv key followed by a linear per-conversation
  * walk inside the task — no cluster barrier rounds at all. (The
  * previous form built the ancestor closure by pointer-doubling
  * self-joins: log₂(depth) rounds, each a shuffle + distinct +
  * lineage cut + driver sync, and O(Σ per-node depth) closure rows —
  * depth²/2 per conversation on a deep chain. The walk emits exactly
  * the O(Σ path length) membership rows being produced, holds only
  * O(conversation turns) structure in memory — three ids per turn,
  * so even a million-turn dialogue is ~tens of MB in one task — and
  * costs zero synchronization. At 1000 executors the doubling form's
  * per-round barriers were the dominant cost; the walk has none.)
  * Task skew is bounded by the largest single conversation, and
  * `maxDepth` stays the loud guard against a store that is secretly
  * an unbounded chain. No windows over anything corpus-sized;
  * content never enters this operator at all (structure only).
  *
  * The result is materialized eagerly (`localCheckpoint`) before
  * returning: every integrity gate fires AT THE CALL, loudly, before
  * any caller writes anything — and multi-consumer callers (the
  * render/pair arms read memberships 2-3×) reuse the pinned rows
  * instead of re-walking.
  *
  * Integrity (all loud, all at call time): a duplicated
  * `(conv, turn)` key is refused (it would silently fan out every
  * downstream join); a non-null parent pointing at a missing turn in
  * its conversation is refused as an orphan (the walk would silently
  * treat it as a root and emit a truncated path); ANY parent cycle —
  * leaf-reachable (the leaf walk exceeds its conversation's turn
  * count / `maxDepth`) or an isolated island (nodes on NO root→leaf
  * path) — is refused; a genuinely deeper-than-`maxDepth` chain is
  * refused with the same guard (raise `maxDepth` deliberately).
  */
object ConvTree {

  /** SQL-order comparison for the first-visit minimum, matching what
    * the previous `min(path_id)` aggregate computed: numeric order for
    * numbers, UTF-8 byte (= code-point) order for strings — Java
    * `String.compareTo` is UTF-16 code-unit order, which disagrees
    * above the BMP (the [[Bpe]] tie-break lesson), so strings compare
    * by code point here.
    */
  private def sqlLess(a: Any, b: Any): Boolean = (a, b) match {
    case (x: String, y: String) =>
      var i = 0
      var j = 0
      var r = 0
      while (r == 0 && i < x.length && j < y.length) {
        val ca = x.codePointAt(i)
        val cb = y.codePointAt(j)
        r = Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      (if (r == 0) Integer.compare(x.length - i, y.length - j) else r) < 0
    case (x: Comparable[_], _) => x.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    case _ =>
      throw new IllegalArgumentException(
        s"treePaths: turn-id type ${a.getClass.getName} has no ordering for the " +
          "first-visit minimum")
  }

  /** Walk one conversation's turns (turn → nullable parent) into
    * membership rows. All integrity gates fire here, inside the task,
    * per conversation — [[treePaths]]' eager materialization surfaces
    * them at the call site.
    */
  private[operators] def walkConversation(
      conv: Any,
      rows: scala.collection.Seq[(Any, Any)],
      maxDepth: Int,
      // The dup-key remedy depends on the CALLER: from treePaths the
      // duplicate is in the turn store; from TreeState.fold (state/
      // batch collisions are refused before the walk) it is within the
      // appended batch — the default message would misdirect the
      // operator to dedupe the wrong dataset.
      dupRemedy: String = "Deduplicate the turn store first."
  ): Iterator[Row] = {
    val n = rows.size
    val parent = new java.util.HashMap[Any, Any](n * 2)
    val hasChild = new java.util.HashSet[Any](n * 2)
    rows.foreach { case (turn, par) =>
      if (parent.containsKey(turn))
        throw new IllegalArgumentException(
          s"treePaths: (conv, turn) is not unique — conversation $conv has turn $turn " +
            "more than once; a duplicated turn row would silently fan out every path " +
            s"join. $dupRemedy")
      parent.put(turn, par)
      if (par != null) hasChild.add(par)
    }
    rows.foreach { case (turn, par) =>
      if (par != null && !parent.containsKey(par))
        throw new IllegalArgumentException(
          s"treePaths: turn $turn in conversation $conv has parent $par which is not a " +
            "turn of that conversation — an orphaned pointer would silently truncate " +
            "its path at the orphan instead of the root")
    }
    val leaves = rows.collect { case (turn, _) if !hasChild.contains(turn) => turn }
    // Chain from a leaf up to its root (root first). In a functional
    // graph (≤1 parent per node) the walk either terminates at a null
    // parent or loops; exceeding min(maxDepth, n) edges proves a cycle
    // (or a deeper-than-contract chain — same loud guard).
    val limit = math.min(maxDepth.toLong, n.toLong)
    def chainOf(leaf: Any): java.util.ArrayDeque[Any] = {
      val chain = new java.util.ArrayDeque[Any](16)
      var cur = leaf
      var edges = 0L
      chain.addFirst(cur)
      var par = parent.get(cur)
      while (par != null) {
        edges += 1
        if (edges > limit)
          throw new IllegalArgumentException(
            s"treePaths: the ancestor walk from leaf $leaf in conversation $conv " +
              s"exceeded $limit edges (maxDepth=$maxDepth, conversation size $n) — the " +
              "parent pointers contain a cycle (or raise maxDepth for genuinely deeper " +
              "trees)")
        cur = par
        chain.addFirst(cur)
        par = parent.get(cur)
      }
      chain
    }
    // First pass: first-visit minimum (smallest leaf id over each
    // turn's memberships) + completeness. O(Σ path length) time,
    // O(turns) memory; the emit pass below re-walks each chain lazily
    // so a bushy conversation never holds its full output at once.
    val firstLeaf = new java.util.HashMap[Any, Any](n * 2)
    leaves.foreach { leaf =>
      val it = chainOf(leaf).iterator()
      while (it.hasNext) {
        val t = it.next()
        val cur = firstLeaf.get(t)
        if (cur == null || sqlLess(leaf, cur)) firstLeaf.put(t, leaf)
      }
    }
    if (firstLeaf.size != n) {
      val island = rows.collectFirst { case (t, _) if !firstLeaf.containsKey(t) => t }
      throw new IllegalArgumentException(
        s"treePaths: turn ${island.orNull} in conversation $conv is on NO root→leaf " +
          "path — a parent cycle with no leaf beneath it (every node of that cycle has " +
          "a child, so no walk reaches it); fix the parent pointers")
    }
    leaves.iterator.flatMap { leaf =>
      val chain = chainOf(leaf)
      val len = chain.size
      val out = new Array[Row](len)
      val it = chain.iterator()
      var pos = 0
      while (it.hasNext) {
        val t = it.next()
        out(pos) = Row(conv, leaf, pos.toLong, t, firstLeaf.get(t) == leaf)
        pos += 1
      }
      out.iterator
    }
  }

  /** Loud per-conversation row-count guard (the maxDepth discipline
    * applied to WIDTH): the walk buffers one conversation's rows in a
    * single task, so a store where one "conversation" is secretly the
    * whole corpus (a null/default conv key collapsing everything onto
    * one group) would OOM an executor with no diagnosis. At the
    * default 2M rows the buffer is ~hundreds of MB — fail with the
    * conversation named before allocation grows past it. Raise
    * `maxConvRows` deliberately for genuinely huge conversations.
    */
  private[operators] def guardConvRows(
      prefix: String,
      conv: Any,
      soFar: Int,
      maxConvRows: Int
  ): Unit =
    if (soFar > maxConvRows)
      throw new IllegalArgumentException(
        s"$prefix conversation $conv exceeds maxConvRows=$maxConvRows rows in one task — " +
          "a single conversation this large would exhaust executor memory during the " +
          "walk (is the conv key a constant/null collapsing the store onto one group?). " +
          "NOTE the unit is buffered WALK ROWS, not turns: in a TreeState fold that is " +
          "the conversation's state MEMBERSHIP rows (≈ paths × depth, which a bushy tree " +
          "of far fewer turns can exceed) plus its batch turns. Raise max_conv_rows " +
          "deliberately for genuinely huge conversations (--max_conv_rows on the " +
          "tree/turns verbs)")

  def treePaths(
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      parentCol: String,
      maxDepth: Int = 10000,
      maxConvRows: Int = 2000000
  ): DataFrame = {
    require(maxDepth > 0, s"maxDepth must be positive, got $maxDepth")
    require(maxConvRows > 0, s"maxConvRows must be positive, got $maxConvRows")
    val t = turns.select(
      col(convCol).as("__conv"),
      col(turnCol).as("__turn"),
      col(parentCol).as("__parent")
    )
    val inSchema = t.schema
    val outSchema = StructType(Seq(
      StructField("conv_id", inSchema("__conv").dataType, inSchema("__conv").nullable),
      StructField("path_id", inSchema("__turn").dataType, inSchema("__turn").nullable),
      StructField("pos", LongType, nullable = false),
      StructField("turn_id", inSchema("__turn").dataType, inSchema("__turn").nullable),
      StructField("train", BooleanType, nullable = false)
    ))
    val md = maxDepth
    val mcr = maxConvRows
    // One hash exchange on the conv key + a local sort co-locates each
    // conversation; the task then streams conversation groups through
    // the walk — structure only, one group in memory at a time.
    val walked = t
      .repartition(col("__conv"))
      .sortWithinPartitions(col("__conv"))
      .mapPartitions { rows =>
        val buffered = rows.buffered
        Iterator
          .continually(())
          .takeWhile(_ => buffered.hasNext)
          .flatMap { _ =>
            val conv = buffered.head.get(0)
            val group = scala.collection.mutable.ArrayBuffer.empty[(Any, Any)]
            while (buffered.hasNext && buffered.head.get(0) == conv) {
              val r = buffered.next()
              group += ((r.get(1), r.get(2)))
              guardConvRows("treePaths:", conv, group.length, mcr)
            }
            walkConversation(conv, group, md)
          }
      }(Encoders.row(outSchema))
    // Eager pin: gates fire NOW (loud at the call, before any caller
    // writes), and every downstream consumer reuses the walked rows.
    unwrapGateFailure(walked.localCheckpoint())
  }

  /** Run `action`; if it fails because a task-side integrity gate
    * threw (the walk's loud refusals surface wrapped in a
    * SparkException), rethrow the root IllegalArgumentException so
    * callers keep the documented loud-gate contract. Only OUR gate
    * messages unwrap (the `treePaths:` / `TreeState.fold:` prefixes) —
    * a foreign IllegalArgumentException nested under an infrastructure
    * failure (codec, commit protocol) must NOT be rebranded as a
    * data-integrity refusal, or retry-on-infrastructure logic keyed on
    * exception type would retry nothing.
    */
  private[operators] def unwrapGateFailure[T](action: => T): T =
    try action
    catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c != null) {
          c match {
            case iae: IllegalArgumentException
                if iae.getMessage != null &&
                  (iae.getMessage.startsWith("treePaths:") ||
                    iae.getMessage.startsWith("TreeState.fold:")) =>
              throw new IllegalArgumentException(iae.getMessage, e)
            case _ => c = c.getCause
          }
        }
        throw e
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
    * riding the walked membership table treePaths already pins.
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
    * re-walking the full store.
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
    * membership table instead of re-walking the store.
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
