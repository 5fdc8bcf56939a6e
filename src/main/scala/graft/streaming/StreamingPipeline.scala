package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the engine-managed successor to the
  * reference's orchestration-level micro-batching (one Airflow run per
  * uploaded file — SURVEY §2.9). A file-source stream with
  * `Trigger.AvailableNow` gives the same per-file incremental semantics
  * with engine bookkeeping (exactly-once file tracking, checkpointed
  * state) instead of Airflow run configs.
  *
  * At scale: watermarks bound state; windowed aggregates shuffle once on
  * (window, key); `flatMapGroupsWithState` keeps per-user session state
  * partitioned by user across executors.
  */
object StreamingPipeline {

  /** Events schema as the streaming source sees it (ts arrives as
    * epoch-nanos long — same nanos workaround as the batch reader).
    */
  val eventsRawSchema: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)
    )
  )

  /** File-source stream over an events parquet directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Windowed aggregation with a watermark: 5-minute tumbling windows
    * per event_type; late data beyond 10 minutes is dropped.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )

  case class SessionEvent(event_id: Long, user_id: Long, tsSec: Long)
  case class SessionState(sessionSeq: Long, lastTsSec: Long)
  case class SessionAssignment(event_id: Long, user_id: Long, session_seq: Long)

  /** Stateful sessionization: mirrors the batch q11 semantics (new
    * session after a >30-minute gap) with per-user state kept in the
    * state store. NoTimeout keeps micro-batch scheduling data-driven
    * (a processing-time timeout would spin empty batches under
    * AvailableNow-style runs); long-running deployments bound state by
    * switching to EventTimeTimeout + a watermark.
    */
  def sessionize(events: DataFrame)(implicit spark: SparkSession): Dataset[SessionAssignment] = {
    import spark.implicits._
    events
      .select(
        col("event_id"),
        col("user_id"),
        col("ts").cast("long").as("tsSec")
      )
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = rows.toSeq.sortBy(e => (e.tsSec, e.event_id)).map { e =>
            val newSession = st.lastTsSec == Long.MinValue || e.tsSec - st.lastTsSec > 1800
            st = SessionState(if (newSession) st.sessionSeq + 1 else st.sessionSeq, e.tsSec)
            SessionAssignment(e.event_id, e.user_id, st.sessionSeq)
          }
          state.update(st)
          out.iterator
        }
      )
  }

  /** Incremental star-schema maintenance: the reference's per-file
    * users/time pipeline as a `foreachBatch` stream — every new file in
    * `rawDir` updates the tables, with engine-managed file tracking.
    */
  def incrementalTables(
      spark: SparkSession,
      rawDir: String,
      outDir: String,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val logData = spark.readStream
      .schema(graft.schemas.Schemas.logData)
      .json(rawDir)
    logData.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.transforms.Transforms._
        val ev = nextSongEvents(batch)
        usersTable(ev).write.mode("overwrite").parquet(s"$outDir/users_table.parquet")
        timeTable(withStartTime(ev)).write
          .mode("overwrite")
          .parquet(s"$outDir/time_table.parquet")
      }
      .start()
  }
}
