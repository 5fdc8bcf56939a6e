package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the pipeline's JSON+parquet: CSV, ORC and
  * line-delimited JSON, with the conventions that survive 100 TB:
  *
  *   - Schema is ALWAYS explicit on read. Inference costs an extra full
  *     scan and silently drifts when a column's observed values change;
  *     an explicit schema also lets the vectorized readers prune and
  *     push down exactly as with parquet.
  *   - `failFast` toggles PERMISSIVE (default: malformed rows become
  *     nulls, the resilient bulk-ingest mode) vs FAILFAST (strict
  *     parity-checking mode that surfaces poisoned inputs — pair with
  *     [[graft.pipeline.Pipeline.runIncrementalQuarantined]]).
  *   - Writers default to overwrite semantics and leave file sizing to
  *     the engine (no coalesce) — AQE-set partition sizes become output
  *     files; compression is a per-call knob.
  */
object Formats {

  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ",",
      failFast: Boolean = false
  ): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  def writeCsv(
      df: DataFrame,
      path: String,
      header: Boolean = true,
      delimiter: String = ",",
      compression: String = "none"
  ): Unit =
    df.write
      .mode("overwrite")
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("compression", compression)
      .csv(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      failFast: Boolean = false
  ): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  def writeJsonl(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
