package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the engine.
  *
  * Settings are chosen for the local[32] test harness but with the
  * 1000-executor posture in mind: AQE on (runtime shuffle coalescing +
  * skew-join splitting), UTC session timezone (reproduces the reference's
  * `datetime.fromtimestamp` on a UTC cluster — see
  * reference `spark-jobs/sparkify_etl.py:146-149`), and shuffle
  * partitions sized to the local core count rather than the 200 default.
  */
object GraftSession {

  def builder(appName: String = "graft", master: String = ""): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Volume-adaptive shuffle width: AQE can only coalesce DOWN from
      // the initial partition count, so a fixed 32 starves corpus-sized
      // shuffles (measured: the release soak's 270M-token pack_export
      // spilled through ~8.4M-token partitions and went 10.7x for 5x
      // the data — SCALE.md round-11 table). Start shuffles wide; AQE
      // coalesces small queries back to a handful of partitions, so
      // fixture-scale plans keep their task counts while corpus-scale
      // stages get the width the volume needs. 8x cores locally mirrors
      // the 2-5x-cores guidance a real cluster runs with.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", (cpus.toInt * 8).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // S11 parity: fewer GCS metadata ops on commit when running
      // against gs:// paths (no-op on local FS).
      .config("spark.hadoop.fs.gs.implicit.dir.repair.enable", "false")
    if (master.nonEmpty) b.master(master) else b
  }

  /** Session for local runs and tests. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName, s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
