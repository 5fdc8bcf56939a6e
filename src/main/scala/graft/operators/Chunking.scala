package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the long-document primitive
  * shared by embedding/retrieval pipelines (a doc longer than the
  * encoder's context splits into overlapping windows) and long-context
  * pretraining prep (fixed windows with stride < window keep
  * boundary-spanning text intact in SOME chunk). Deterministic and
  * purely positional: chunk k of a document covers tokens
  * `[k·stride, k·stride + window)` of its whitespace token sequence.
  *
  * Emission rule (documented, deterministic): a chunk is emitted iff
  * it ADDS tokens — chunk 0 always, a later chunk only when the
  * previous chunk did not already reach the document's end
  * (`(k−1)·stride + window < n_toks`). This keeps the tail covered
  * exactly once without emitting a final window fully contained in
  * its predecessor. Empty documents (no tokens) emit nothing.
  *
  * Scale shape: one explode per document (O(chunks) output rows,
  * bounded by `n_toks / stride` each), everything a built-in
  * codegen'd array expression — no shuffle, no UDF, no window
  * function; the chunk text is a slice + join of the row's OWN token
  * array, so text never moves between rows.
  */
object Chunking {

  def slidingChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Long,
      stride: Long
  ): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0, s"stride must be positive, got $stride")
    require(
      stride <= window,
      s"stride $stride > window $window would DROP the tokens between consecutive windows"
    )
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn(
        "start_tok",
        explode(sequence(lit(0L), col("__n") - 1L, lit(stride)))
      )
      // chunk 0 always; a later chunk only if the previous one did not
      // already cover the document's tail
      .filter(col("start_tok") === 0L || col("start_tok") - stride + window < col("__n"))
      .select(
        col(idCol),
        expr(s"start_tok div ${stride}L").as("chunk_idx"),
        col("start_tok"),
        least(lit(window), col("__n") - col("start_tok")).as("n_chunk_toks"),
        array_join(
          slice(col("__toks"), (col("start_tok") + 1L).cast("int"), least(lit(window), col("__n") - col("start_tok")).cast("int")),
          " "
        ).as("chunk")
      )
  }
}
