package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary encoding for token streams: assign every distinct token
  * a DENSE id (0..V−1, lexicographic order) so pack materialization
  * can emit integer sequences — what a trainer actually memory-maps —
  * instead of strings. The id rule is pure (rank in sorted order), so
  * the table is reproducible from the corpus alone and two workers
  * never disagree.
  *
  * Scale shape: distributed dense-rank without a global sort-on-one-
  * task. The distinct-token table range-partitions on the token
  * (Spark's sampled range bounds — partition SIZES depend on the
  * sample, the final ids never do), ranks within each ordered
  * partition, and prefix-sums the O(partitions) counts on the driver —
  * the same two-pass-prefix discipline as the packing layouts. A
  * `Window.orderBy(token)` over the vocabulary (10⁸ rows on one task
  * at web scale) is the shape this avoids, plan-locked.
  */
object Vocab {

  /** (token, token_id, cnt) over a corpus' whitespace tokens:
    * `token_id` = dense lexicographic rank (0-based), `cnt` = corpus
    * frequency. `nParts` bounds the per-partition rank window
    * (vocab/nParts rows each); size it like any shard count.
    */
  def build(docs: DataFrame, textCol: String, nParts: Int = 32): DataFrame = {
    val hist = docs
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    withIds(hist, "token", nParts)
  }

  /** Dense-rank `ordCol` over any distinct-keyed table: adds `<ordCol>_id`
    * = the row's 0-based rank in the column's ascending order.
    *
    * The range shuffle is PINNED (`localCheckpoint`) before either
    * pass reads it: Spark samples range bounds per query EXECUTION,
    * not per plan, so the counts job and the output job would
    * otherwise each draw their own bounds and disagree on which
    * partition a key landed in — the prefix offsets then misalign and
    * the "dense" ids collide/skip. Invisible at test scale (tiny
    * partitions make the sample exhaustive, bounds deterministic);
    * reproduced at 3M tokens (`CurateStress vocab`: 2.90M distinct
    * ids for 3M tokens, max id 3003891 before the pin). The pin also
    * makes the second pass read the shuffle output instead of
    * recomputing the upstream distinct.
    */
  private[graft] def withIds(distinctRows: DataFrame, ordCol: String, nParts: Int): DataFrame = {
    val spark = distinctRows.sparkSession
    // RangePartitioning assigns ordered partition ids (pid 0 holds the
    // smallest keys), so global rank = prefix(pid) + within-pid rank.
    val parted = distinctRows
      .repartitionByRange(nParts, col(ordCol))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy(col("pid")).orderBy(col(ordCol))
    val ranked = parted.withColumn("r", row_number().over(w))
    // Bounded collect: one count per range partition (from the pinned
    // shuffle — no window needed to count).
    val counts = parted
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts
      .scanLeft((0, 0L, 0L)) { case ((_, acc, _), (p, n)) => (p, acc + n, acc) }
      .drop(1)
      .map { case (p, _, off) => (p, off) }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("pid", "pid_off"))
    ranked
      .join(offDf, Seq("pid"))
      .withColumn(s"${ordCol}_id", col("pid_off") + col("r") - 1L)
      .drop("pid", "r", "pid_off")
  }

  /** Encode materialized pack slices (the q111 shape: one row per pack
    * position carrying a string token) into the integer id space: one
    * equi-join against the vocabulary — the final hop from text to the
    * (pack_id, pos_in_pack, token_id) sequences a training job
    * memory-maps. Slices are already O(requested packs × budget) rows
    * (the loaders prune before exploding), so the join cost follows
    * the request, not the corpus.
    *
    * OOV contract: a token absent from the frozen vocab (a vocab built
    * on an older corpus snapshot) either maps to the explicit reserved
    * `unkId` (left join + coalesce — positions stay gapless) or, with
    * `unkId = None`, DROPS its position (inner join — the hole stays
    * visible in [[packArrays]]' positions array). The `pack_export`
    * verb refuses the silent-drop path when OOV exists: it counts the
    * anti-join misses first and fails loudly unless `--unk_id` is
    * given.
    */
  def encodeSlices(slices: DataFrame, vocab: DataFrame, unkId: Option[Long] = None): DataFrame =
    unkId match {
      case None =>
        slices
          .join(vocab.select(col("token"), col("token_id")), Seq("token"))
          .select(col("pack_id"), col("pos_in_pack"), col("doc_id"), col("token_id"))
      case Some(u) =>
        slices
          .join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
          .select(
            col("pack_id"),
            col("pos_in_pack"),
            col("doc_id"),
            coalesce(col("token_id"), lit(u)).as("token_id")
          )
    }

  /** Encoded slices rolled into ONE row per pack — the memory-map
    * shape a binary-shard export writes: `positions`/`token_ids` as
    * parallel position-sorted arrays (the positions array keeps hole
    * accounting — an empty token dropped at the encode join stays
    * visible as a missing position). One keyed aggregation over the
    * already-pruned O(packs × budget) slice rows; `sort_array` on the
    * (pos, id) struct gives both arrays one deterministic order.
    */
  def packArrays(slices: DataFrame, vocab: DataFrame, unkId: Option[Long] = None): DataFrame =
    encodeSlices(slices, vocab, unkId)
      .groupBy(col("pack_id"))
      .agg(sort_array(collect_list(struct(col("pos_in_pack"), col("token_id")))).as("ps"))
      .select(
        col("pack_id"),
        expr("transform(ps, x -> x.pos_in_pack)").as("positions"),
        expr("transform(ps, x -> x.token_id)").as("token_ids")
      )

  /** Inverse of [[packArrays]]: id-arrays back to text through the
    * frozen vocab — the debugging tool a training-data incident needs
    * ("what is IN pack 48113?") and the decode path the sft_release
    * gold-proof exercises, exposed as a first-class operator (and the
    * `decode_packs` CLI verb) instead of living only inside a spec.
    * Returns one row per pack: `(pack_id, text, n_tokens)`, tokens
    * space-joined in position order.
    *
    * An id absent from the vocab (an export encoded with `--unk_id`,
    * or a vocab/export version mismatch) decodes as the literal
    * `<unk>` rather than silently vanishing — a dropped token would
    * shift every later position and make the decode lie about
    * alignment.
    *
    * Scale shape: posexplode to O(tokens) rows, one broadcast-eligible
    * join against the vocab (dictionary ≪ corpus), one keyed re-agg
    * per pack — decode cost is linear in the decoded slice, and a
    * caller decoding a single pack prunes to one row before the
    * explode.
    */
  def decodePacks(packs: DataFrame, vocab: DataFrame): DataFrame =
    packs
      .select(col("pack_id"), posexplode(col("token_ids")).as(Seq("idx", "token_id")))
      .join(vocab.select(col("token_id"), col("token")), Seq("token_id"), "left")
      .groupBy(col("pack_id"))
      .agg(
        sort_array(collect_list(struct(col("idx"), coalesce(col("token"), lit("<unk>")).as("token"))))
          .as("ts")
      )
      .select(
        col("pack_id"),
        expr("array_join(transform(ts, x -> x.token), ' ')").as("text"),
        size(col("ts")).cast("long").as("n_tokens")
      )

  /** Vocabulary COVERAGE curve — the tokenizer-sizing audit: for each
    * coverage target (in milli, e.g. 950 = 95%), the smallest number
    * of token TYPES (taken in descending frequency, ties to the
    * lexicographically smaller token) whose occurrences cover that
    * fraction of the token stream. "How big must the vocab be before
    * `<unk>` is rare" is the question every dictionary/BPE sizing
    * decision starts from, and the Zipf tail makes the answer
    * non-obvious per corpus.
    *
    * Output: `(coverage_milli, n_types, total_types, total_tokens)` —
    * one row per target. All arithmetic integer and exact: the
    * coverage test is `cum·1000 ≥ target·total` (no division at all).
    *
    * Scale shape: the corpus-sized stage is the token histogram (one
    * explode + one map-side-combined agg, O(types) out). The ranking
    * is the [[withIds]] two-pass discipline generalized to carry a
    * RUNNING SUM: range-partition by (cnt desc, token), pin the
    * shuffle (`localCheckpoint` — range bounds are sampled per
    * execution, so unpinned passes could disagree), take per-partition
    * windows (each a range slice, never the whole table in one task),
    * then one bounded O(nParts) collect for the cross-partition rank
    * and cumulative offsets. The target probe is a 4-row broadcast
    * against the ranked types.
    */
  def coverageCurve(
      docs: DataFrame,
      textCol: String,
      targetsMilli: Seq[Long] = Seq(500L, 900L, 950L, 990L),
      nParts: Int = 32
  ): DataFrame = {
    require(targetsMilli.nonEmpty, "coverageCurve needs at least one target")
    require(
      targetsMilli.forall(t => t >= 1 && t <= 1000),
      s"coverage targets are milli-fractions in [1, 1000], got $targetsMilli"
    )
    val spark = docs.sparkSession
    val hist = docs
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val parted = hist
      .repartitionByRange(nParts, col("cnt").desc, col("token").asc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wOrd = Window
      .partitionBy(col("pid"))
      .orderBy(col("cnt").desc, col("token").asc)
    val wSum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = parted
      .withColumn("r", row_number().over(wOrd))
      .withColumn("cum_in", sum(col("cnt")).over(wSum))
    // Bounded collect: one (row count, token sum) per range partition.
    val perPid = parted
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(perPid.nonEmpty, "coverageCurve: empty corpus (no tokens)")
    val rankOff = perPid.scanLeft(0L)(_ + _._2).init
    val cumOff = perPid.scanLeft(0L)(_ + _._3).init
    val totalTypes = perPid.map(_._2).sum
    val totalTokens = perPid.map(_._3).sum
    import spark.implicits._
    val offDf = broadcast(
      perPid.toIndexedSeq
        .zip(rankOff)
        .zip(cumOff)
        .map { case (((p, _, _), ro), co) => (p, ro, co) }
        .toDF("pid", "rank_off", "cum_off")
    )
    val targets = broadcast(targetsMilli.toDF("coverage_milli"))
    ranked
      .join(offDf, Seq("pid"))
      .select(
        (col("rank_off") + col("r")).as("rnk"),
        (col("cum_off") + col("cum_in")).as("cum")
      )
      .join(targets, col("cum") * 1000L >= col("coverage_milli") * totalTokens)
      .groupBy(col("coverage_milli"))
      .agg(min(col("rnk")).as("n_types"))
      .select(
        col("coverage_milli"),
        col("n_types"),
        lit(totalTypes).as("total_types"),
        lit(totalTokens).as("total_tokens")
      )
  }
}
