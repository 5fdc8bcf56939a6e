package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries over the multimodal pipeline (payloads built
  * from document text bytes — see [[graft.multimodal.Multimodal]]).
  */
object MultimodalQueries {

  private def assets(spark: SparkSession, dir: String): DataFrame =
    Multimodal.assetsFromDocuments(spark.read.parquet(s"$dir/documents.parquet"))

  /** Decode + frame-sample: per-asset metadata with the sampled frame
    * count (explode → count back — exercises the lateral view).
    */
  def q27MultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val dec = Multimodal.decode(assets(spark, dir))
    val sampled = Multimodal
      .sampleFrames(dec, step = 10)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"))
    dec
      .join(sampled, Seq("asset_id"), "left")
      .select(
        col("asset_id"),
        col("media_type"),
        col("byte_len"),
        col("content_md5"),
        col("width"),
        col("height"),
        col("n_frames"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled")
      )
  }

  /** Feature extraction + resize over the decoded assets. */
  def q28MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val dec = Multimodal.resize(Multimodal.features(Multimodal.decode(assets(spark, dir))))
    dec.select(
      col("asset_id"),
      col("width"),
      col("height"),
      element_at(col("feature"), 1).as("f0"),
      element_at(col("feature"), 2).as("f1"),
      element_at(col("feature"), 3).as("f2"),
      element_at(col("feature"), 4).as("f3")
    )
  }
}
