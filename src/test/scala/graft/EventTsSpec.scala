package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Locks the events `ts` ingestion against generator schema drift: the
  * same logical events must load identically whether the parquet stores
  * ts as epoch-nanos BIGINT (the pre-round-8 generator), TIMESTAMP
  * without tz metadata (TIMESTAMP_NTZ — the current generator), or a
  * tz-adjusted TIMESTAMP (what our own sinks write). Round 8's testdata
  * regeneration flipped the first to the second and broke every
  * events-reading surface at analysis time; this spec is the regression
  * gate for the adaptive loader that fixed it.
  */
class EventTsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-eventts-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  // Known epochs (µs): sub-second precision, a pre-1970-adjacent value
  // kept positive (the reference semantics assume positive epochs), and
  // a null. Nanos variant carries sub-µs digits that must truncate.
  private val epochsUs = Seq(1541121934796000L, 1541121934900123L, 104000L)

  private def writeShape(shape: String): String = {
    val dir = Files.createTempDirectory(s"graft-ts-$shape").toString
    import spark.implicits._
    val base = epochsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, s"t$i", i * 1.5, s"""{"i":$i}""") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withNull = base.withColumn(
      "us",
      when(col("event_id") === 2L, lit(null).cast("long")).otherwise(col("us"))
    )
    val ts = shape match {
      case "long_nanos" => (col("us") * 1000L).cast(LongType)
      case "ntz"        => timestamp_micros(col("us")).cast(TimestampNTZType)
      case "ltz"        => timestamp_micros(col("us"))
    }
    withNull
      .select(
        col("event_id"),
        ts.as("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props")
      )
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private def loaded(dir: String): Set[(Long, Option[Long])] =
    queries.CoreQueries
      .events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet

  test("batch loader: all three ts shapes load to identical session-TZ timestamps") {
    val want = Set(
      (0L, Some(epochsUs(0))),
      (1L, Some(epochsUs(1))),
      (2L, None)
    )
    for (shape <- Seq("long_nanos", "ntz", "ltz")) {
      val got = loaded(writeShape(shape))
      assert(got == want, s"shape=$shape: $got")
      val dt = queries.CoreQueries
        .events(spark, writeShape(shape))
        .schema("ts")
        .dataType
      assert(dt == TimestampType, s"shape=$shape normalizes to session-TZ TIMESTAMP, got $dt")
    }
  }

  test("batch loader: unsupported ts type fails loudly, not with null rows") {
    val dir = Files.createTempDirectory("graft-ts-bad").toString
    import spark.implicits._
    Seq((1L, "not-a-time"))
      .toDF("event_id", "ts")
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      queries.CoreQueries.events(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("streaming reader: probes the footer schema, so a long-nanos archive still streams") {
    val dir = writeShape("long_nanos")
    val out = streaming.StreamingPipeline
      .readEvents(spark, s"$dir/events.parquet")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream
      .format("memory")
      .queryName("eventts_archive")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    out.awaitTermination(60000)
    val got = spark
      .table("eventts_archive")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got == Set((0L, Some(epochsUs(0))), (1L, Some(epochsUs(1))), (2L, None)))
  }
}
