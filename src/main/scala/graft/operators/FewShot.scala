package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic few-shot prompt assembly — the eval-harness prep
  * step: every eval item gets k demonstration shots drawn from the
  * TRAIN pool by a seeded hash, and the rendered prompt is
  * `shot₁ … shot_k query`. Two properties the harness needs are
  * guaranteed by construction rather than by convention:
  *
  *   - LEAKAGE-SAFE: shots come from the train table only — an eval
  *     item can never appear as its own (or another item's)
  *     demonstration, because the eval table never enters the shot
  *     join.
  *   - REPRODUCIBLE: shot choice is `h28(seed, eval id, slot) mod
  *     |train|` over the train pool's dense doc-id rank — a pure
  *     function of (seed, ids), identical on every engine, every
  *     partitioning, every rerun. Changing the seed re-rolls every
  *     prompt; nothing else does.
  *
  * [[assemble]]'s slots draw independently, so an eval item CAN
  * repeat a shot when k approaches the pool size (collisions are
  * ~k²/2|train|); [[assembleDistinct]] resolves collisions with a
  * deterministic linear probe in rank space, guaranteeing k DISTINCT
  * shots whenever k ≤ |train| while keeping the same (seed, ids)-pure
  * contract.
  *
  * INTERLOCKS: an EMPTY train pool is refused loudly (h28 mod 0 is
  * NULL and the rank join would silently drop every eval item), and
  * so is a pool at or past 2²⁸ rows — the 28-bit shot hash can never
  * select ranks ≥ 2²⁸, silently excluding the tail of the pool.
  * Below the ceiling `h28 mod n` over-draws the lowest `2²⁸ mod n`
  * ranks by at most n/2²⁸ relative probability — negligible at
  * documented pool sizes (eval-harness prep over curated pools), and
  * pinned here so nobody rediscovers it.
  *
  * Scale shape: the train pool is dense-ranked once (the [[Vocab]]
  * two-pass discipline — no global single-task sort), the slot
  * explode is k rows per eval item, the shot lookup is one
  * equi-join on the rank (train side shuffles once on a LONG key,
  * never text), and the render is one eval-keyed agg over k+1 rows
  * per item. |train| is counted once up front — the same O(train)
  * aggregate the interlocks need — and enters the plan as a literal,
  * so the modulo stays a pure per-row projection.
  */
object FewShot {

  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Dense-ranked train pool + the loud pool-size interlocks; shared
    * by both assembly variants. Returns (ranked pool, |train|).
    */
  private def rankedPool(
      train: DataFrame,
      idCol: String,
      textCol: String,
      caller: String
  ): (DataFrame, Long) = {
    val ranked = Vocab
      .withIds(
        train.select(col(idCol).as("__tid"), col(textCol).as("__ttext")),
        "__tid",
        nParts = 32
      )
      .select(col("__tid_id").as("__rank"), col("__tid").as("__shot_id"), col("__ttext"))
    val nTrain = ranked.agg(count(lit(1))).collect()(0).getLong(0)
    require(
      nTrain > 0,
      s"FewShot.$caller: the train pool is EMPTY — `h28 mod 0` is NULL and the rank " +
        "join would silently drop every eval item from the output; supply a non-empty " +
        "train table"
    )
    require(
      nTrain < (1L << 28),
      s"FewShot.$caller: train pool has $nTrain rows ≥ 2^28 — the 28-bit shot hash " +
        "can never select ranks ≥ 2^28, silently excluding the tail of the pool; " +
        "sample the pool below 2^28 first"
    )
    (ranked, nTrain)
  }

  private def render(joined: DataFrame, idCol: String): DataFrame =
    joined
      .groupBy(col(idCol))
      .agg(
        first(col("__qtext")).as("__q"),
        sort_array(collect_list(struct(col("__slot"), col("__shot_id"), col("__ttext"))))
          .as("__shots")
      )
      .select(
        col(idCol),
        expr("transform(__shots, s -> s.__shot_id)").as("shot_ids"),
        concat(
          expr("array_join(transform(__shots, s -> s.__ttext), ' ')"),
          lit(" "),
          col("__q")
        ).as("prompt")
      )

  /** `(eval idCol, shot_ids, prompt)` — one row per eval item;
    * `shot_id`s in slot order are also emitted as an array column so
    * the provenance of every prompt is auditable without re-parsing
    * text. Slots draw independently (repeats possible near pool
    * exhaustion — see [[assembleDistinct]]).
    */
  def assemble(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      seed: String
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (ranked, nTrain) = rankedPool(train, idCol, textCol, "assemble")
    val slots = eval
      .select(col(idCol), col(textCol).as("__qtext"))
      .withColumn("__slot", explode(sequence(lit(0), lit(k - 1))))
      .withColumn(
        "__rank",
        h28(
          concat(
            lit(s"${seed}_"),
            col(idCol).cast("string"),
            lit("_"),
            col("__slot").cast("string")
          )
        ) % lit(nTrain)
      )
    render(slots.join(ranked, Seq("__rank")), idCol)
  }

  /** [[assemble]] with k DISTINCT shots guaranteed whenever
    * k ≤ |train|: slot s starts from the same independent draw
    * `h28(seed, id, s) mod n` and, if that rank is already taken by
    * an earlier slot, walks FORWARD in rank space (`(base + p) mod
    * n`, p = 0, 1, …) to the first free rank — deterministic linear
    * probing, still a pure function of (seed, ids). Since at most
    * k−1 ranks are taken, p < k always suffices, so the resolution
    * is one per-row fold over a k-sized array — codegen'd, no
    * shuffle, no UDF. Slots that did NOT collide pick exactly what
    * [[assemble]] picks.
    */
  def assembleDistinct(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      seed: String
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (ranked, nTrain) = rankedPool(train, idCol, textCol, "assembleDistinct")
    require(
      k <= nTrain,
      s"FewShot.assembleDistinct: k=$k distinct shots from a pool of $nTrain — " +
        "impossible by pigeonhole; lower k or grow the pool"
    )
    // Per eval item: k base ranks, then a fold over slots in order —
    // each slot takes the first untaken rank on its forward probe
    // walk. Everything is array arithmetic on k elements per row,
    // built with the Column API (never string-interpolated SQL: a
    // seed containing a quote or backslash must hash EXACTLY as
    // [[assemble]]'s `lit(seed)` does — the documented parity — and
    // must never reach a SQL parser).
    val bases = eval
      .select(col(idCol), col(textCol).as("__qtext"))
      .withColumn(
        "__bases",
        transform(
          sequence(lit(0), lit(k - 1)),
          s =>
            h28(
              concat(
                lit(s"${seed}_"),
                col(idCol).cast("string"),
                lit("_"),
                s.cast("string")
              )
            ) % lit(nTrain)
        )
      )
      .withColumn(
        "__ranks",
        aggregate(
          col("__bases"),
          typedLit(Seq.empty[Long]),
          (taken, base) =>
            array_append(
              taken,
              element_at(
                filter(
                  transform(sequence(lit(0), lit(k - 1)), p => pmod(base + p, lit(nTrain))),
                  c => !array_contains(taken, c)
                ),
                1
              )
            )
        )
      )
    val slots = bases
      .select(
        col(idCol),
        col("__qtext"),
        posexplode(col("__ranks")).as(Seq("__slot", "__rank"))
      )
    render(slots.join(ranked, Seq("__rank")), idCol)
  }
}
