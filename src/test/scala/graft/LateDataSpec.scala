package graft

import graft.pipeline.Pipeline
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Watermark late-data semantics + dynamic partition overwrite. */
class LateDataSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-late-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private def nanos(s: String): Long =
    java.sql.Timestamp.valueOf(s).getTime * 1000000L

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, Long, Long)]): Unit =
    rows
      .map { case (id, ts, uid) => (id, ts, uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("append")
      .parquet(dir)

  test("watermark drops events later than the 10-minute horizon") {
    val dir = Files.createTempDirectory("graft-late").toString
    writeBatch(dir, "b1", Seq((1L, nanos("2024-01-01 10:00:00"), 1L), (2L, nanos("2024-01-01 10:01:00"), 2L)))
    val q = StreamingPipeline
      .windowedCounts(StreamingPipeline.readEvents(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("late_counts")
      .start()
    q.processAllAvailable()
    // advance the watermark far past the first window
    writeBatch(dir, "b2", Seq((3L, nanos("2024-01-01 11:00:00"), 1L)))
    q.processAllAvailable()
    val afterAdvance = spark.sql("SELECT sum(n) FROM late_counts").collect()(0).getLong(0)
    assert(afterAdvance == 2L, "first window finalized with its 2 events")
    // an event 50 minutes late targets the already-finalized window -> dropped
    writeBatch(dir, "b3", Seq((4L, nanos("2024-01-01 10:02:00"), 3L)))
    q.processAllAvailable()
    q.stop()
    val afterLate = spark.sql("SELECT sum(n) FROM late_counts").collect()(0).getLong(0)
    assert(afterLate == 2L, s"late event must be dropped, got $afterLate")
  }

  test("dynamic partition overwrite keeps untouched month partitions") {
    val root = Files.createTempDirectory("graft-dyn").toString + "/"
    def logLine(ts: Double): String =
      s"""{"artist":null,"auth":"a","firstName":"F","gender":"F","itemInSession":1,"lastName":"L","length":null,"level":"free","location":"X","method":"PUT","page":"NextSong","registration":null,"sessionId":1,"song":null,"status":200,"ts":$ts,"userAgent":"M","userId":"1"}"""
    val raw = Files.createTempDirectory("graft-dyn-raw")
    // run 1: a November 2018 event
    Files.writeString(raw.resolve("f1.json"), logLine(1542241826796.0))
    Pipeline.runIncremental(
      spark, raw.resolve("f1.json").toString, root,
      partitionTimeByMonth = true, dynamicPartitionOverwrite = true
    )
    // run 2: a January 2019 event only
    Files.writeString(raw.resolve("f2.json"), logLine(1546304461000.0))
    Pipeline.runIncremental(
      spark, raw.resolve("f2.json").toString, root,
      partitionTimeByMonth = true, dynamicPartitionOverwrite = true
    )
    val months = new java.io.File(root + "time_table.parquet")
      .listFiles().map(_.getName).filter(_.startsWith("month=")).sorted
    assert(
      months.toSeq == Seq("month=1", "month=11"),
      s"dynamic overwrite keeps month=11 from run 1, got ${months.mkString(",")}"
    )
    // contrast: STATIC overwrite replaces the whole table
    Pipeline.runIncremental(
      spark, raw.resolve("f2.json").toString, root,
      partitionTimeByMonth = true, dynamicPartitionOverwrite = false
    )
    val monthsStatic = new java.io.File(root + "time_table.parquet")
      .listFiles().map(_.getName).filter(_.startsWith("month=")).sorted
    assert(monthsStatic.toSeq == Seq("month=1"), "static overwrite rewrites the table")
  }
}
