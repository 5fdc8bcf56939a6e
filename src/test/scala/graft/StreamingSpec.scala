package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming surface tests: memory sink + AvailableNow over the sf0.001
  * events parquet drive each streaming query synchronously.
  */
class StreamingSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = GraftSession
    .builder("graft-streaming-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val eventsDir = "/root/testdata/sf0.001"

  /** File-stream sources need a directory: stage the single parquet
    * file into one.
    */
  lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-events-stream")
    Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      d.resolve("events-0.parquet")
    )
    d.toString
  }

  test("windowed counts with watermark over file-source stream") {
    val events = StreamingPipeline.readEvents(spark, streamDir)
    val q = StreamingPipeline
      .windowedCounts(events)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_counts")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT * FROM win_counts")
    assert(out.count() > 0)
    // totals must equal the batch count
    val total = spark.sql("SELECT sum(n) FROM win_counts").collect()(0).getLong(0)
    assert(total == 1000L, s"all sf0.001 events counted, got $total")
  }

  test("stateful sessionization matches the batch q11 semantics") {
    val events = StreamingPipeline.readEvents(spark, streamDir)
    val q = StreamingPipeline
      .sessionize(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .sql("SELECT event_id, user_id, session_seq FROM sessions")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = queries.CoreQueries
      .q11Sessionize(spark, eventsDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed == batch, "stream and batch sessionization agree")
  }

  test("incremental foreachBatch pipeline writes users+time tables") {
    val root = Files.createTempDirectory("graft-stream").toString
    val raw = s"$root/raw"
    new java.io.File(raw).mkdirs()
    val line =
      """{"artist":"A","auth":"Logged In","firstName":"F","gender":"F","itemInSession":1,"lastName":"L","length":100.0,"level":"paid","location":"X","method":"PUT","page":"NextSong","registration":1.5E12,"sessionId":1,"song":"S","status":200,"ts":1542241826796.0,"userAgent":"M","userId":"7"}"""
    Files.writeString(java.nio.file.Paths.get(s"$raw/f1.json"), line)
    val q = StreamingPipeline.incrementalTables(spark, raw, s"$root/out", s"$root/ckpt")
    q.awaitTermination(60000)
    val users = spark.read.parquet(s"$root/out/users_table.parquet")
    assert(users.count() == 1)
    assert(users.collect()(0).getAs[String]("user_id") == "7")
  }
}
