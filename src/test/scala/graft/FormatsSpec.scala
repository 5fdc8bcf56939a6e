package graft

import graft.sources.Formats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-trips a slice of the events table (timestamps, doubles, longs,
  * JSON-bearing strings with commas/quotes, nulls) through each
  * source/sink format and asserts exact value equality with the
  * original.
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-formats-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  /** Events slice: ts kept as epoch micros long (CSV/JSON round-trip of
    * sub-second timestamps is format-dependent; integer micros are not).
    */
  lazy val sample: DataFrame = queries.CoreQueries
    .events(spark, "/root/testdata/sf0.001")
    .select(
      col("event_id"),
      col("user_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("event_type"),
      col("value"),
      col("props")
    )
    .limit(200)

  private def asSet(df: DataFrame) =
    df.collect()
      .map(r => (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)).toList)
      .toSet

  test("CSV round-trip preserves values (quoted JSON column included)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(sample, dir)
    val back = Formats.readCsv(spark, dir, sample.schema, failFast = true)
    assert(asSet(back) == asSet(sample))
  }

  test("ORC round-trip preserves values") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(sample, dir)
    val back = Formats.readOrc(spark, dir, sample.schema)
    assert(asSet(back) == asSet(sample))
  }

  test("JSONL round-trip preserves values") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Formats.writeJsonl(sample, dir)
    val back = Formats.readJsonl(spark, dir, sample.schema, failFast = true)
    assert(asSet(back) == asSet(sample))
  }

  test("parquet mergeSchema reads evolving schemas (added column null-filled)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "x").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "x", "y").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "x", "y"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("y")), "old rows null-fill the new column")
    assert(byId(2L).getDouble(merged.columns.indexOf("y")) == 9.5)
  }

  test("CSV failFast surfaces malformed rows; permissive nulls them") {
    val dir = Files.createTempDirectory("graft-csv-bad")
    Files.writeString(dir.resolve("part.csv"), "event_id,user_id\n1,2\nnot_a_long,3\n")
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType)
      )
    )
    val permissive = Formats.readCsv(spark, dir.toString, schema).collect()
    assert(permissive.length == 2 && permissive.exists(_.isNullAt(0)))
    intercept[Exception] {
      Formats.readCsv(spark, dir.toString, schema, failFast = true).collect()
    }
  }
}
