package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * resize / frame-sampling stages.
  *
  * The actual codec is NOT available in this environment, so `decode` is
  * a clearly-marked deterministic stub (metadata derived from a content
  * hash). Everything around it — schema shape, columnar batch flow,
  * partitioning, explode of sampled frames — is real Spark and is what
  * matters at 100 TB: payloads stay in executors, never on the driver;
  * per-row work is codegen'd; frame explosion is a lateral view, not a
  * driver loop.
  *
  * Real-decode integration point: replace [[fakeDecode]] with a
  * `mapPartitions` over payload batches calling into a native library
  * (JNI/FFI), one codec context per partition — the stub preserves that
  * batch-per-partition shape in [[decodeBatched]].
  */
object Multimodal {

  /** 28-bit deterministic int from any column (content-hash based). */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Build an asset table from the documents fixture: the text bytes
    * stand in for an encoded media payload.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")
        .as("media_type")
    )

  /** STUB decode: deterministic fake metadata from the payload hash.
    * A real implementation decodes the container header here.
    */
  def fakeDecode(payload: Column): Column = {
    val h = md5(payload)
    struct(
      (lit(16) + h28(concat(h, lit("w"))) % 1024).cast("int").as("width"),
      (lit(16) + h28(concat(h, lit("h"))) % 1024).cast("int").as("height"),
      (lit(1) + h28(concat(h, lit("f"))) % 240).cast("int").as("n_frames"),
      length(payload).as("byte_len"),
      h.as("content_md5")
    )
  }

  /** Decode stage: payload → metadata struct columns. */
  def decode(assets: DataFrame): DataFrame =
    assets
      .withColumn("meta", fakeDecode(col("payload")))
      .select(
        col("asset_id"),
        col("media_type"),
        col("payload"),
        col("meta.width"),
        col("meta.height"),
        col("meta.n_frames"),
        col("meta.byte_len"),
        col("meta.content_md5")
      )

  /** Batched decode preserving the partition-at-a-time shape a native
    * codec needs (one codec context per partition). Deterministic stub
    * payload→row mapping, identical results to [[decode]]'s metadata.
    */
  def decodeBatched(assets: DataFrame): DataFrame = {
    // A real codec would do: assets.toDF.mapPartitions { rows => init
    // codec once; rows.map(decodeWithCodec) }. The stub keeps the plan
    // columnar instead — same schema, same values, no JVM boundary.
    decode(assets)
  }

  /** Fake feature extraction: a deterministic 4-dim embedding in [0,1)
    * from content-hash chunks (real impl: model inference per batch).
    */
  def features(decoded: DataFrame): DataFrame =
    decoded.withColumn(
      "feature",
      transform(
        sequence(lit(0), lit(3)),
        j => h28(concat(col("content_md5"), j.cast("string"))).cast("double") / lit(268435456.0)
      )
    )

  /** Resize stage: pure metadata transform (halve both dimensions,
    * floor at 1). A real impl maps payload batches through a scaler.
    */
  def resize(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("width", greatest(floor(col("width") / 2).cast("int"), lit(1)))
      .withColumn("height", greatest(floor(col("height") / 2).cast("int"), lit(1)))

  /** Frame sampling: every `step`-th frame index as exploded rows —
    * a lateral view, fully distributed.
    */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame =
    decoded
      .filter(col("media_type") === "video")
      .select(
        col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx")
      )
}
