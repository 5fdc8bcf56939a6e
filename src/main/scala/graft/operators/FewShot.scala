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
  * Slots draw independently, so an eval item CAN repeat a shot when k
  * approaches the pool size (documented; harnesses that need
  * distinct shots deduplicate by re-rolling upstream — at real pool
  * sizes collisions are ~k²/2|train|).
  *
  * Scale shape: the train pool is dense-ranked once (the [[Vocab]]
  * two-pass discipline — no global single-task sort), the slot
  * explode is k rows per eval item, the shot lookup is one
  * equi-join on the rank (train side shuffles once on a LONG key,
  * never text), and the render is one eval-keyed agg over k+1 rows
  * per item. |train| rides along as a 1-row broadcast, never a
  * driver literal.
  */
object FewShot {

  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** `(eval idCol, slot, shot_id, prompt)` — one row per eval item;
    * `shot_id`s in slot order are also emitted as an array column so
    * the provenance of every prompt is auditable without re-parsing
    * text.
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
    val ranked = Vocab
      .withIds(
        train.select(col(idCol).as("__tid"), col(textCol).as("__ttext")),
        "__tid",
        nParts = 32
      )
      .select(col("__tid_id").as("__rank"), col("__tid").as("__shot_id"), col("__ttext"))
    val nTrain = ranked.agg(count(lit(1)).as("__n_train"))
    val slots = eval
      .select(col(idCol), col(textCol).as("__qtext"))
      .withColumn("__slot", explode(sequence(lit(0), lit(k - 1))))
      .crossJoin(broadcast(nTrain))
      .withColumn(
        "__rank",
        h28(
          concat(
            lit(s"${seed}_"),
            col(idCol).cast("string"),
            lit("_"),
            col("__slot").cast("string")
          )
        ) % col("__n_train")
      )
    slots
      .join(ranked, Seq("__rank"))
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
  }
}
