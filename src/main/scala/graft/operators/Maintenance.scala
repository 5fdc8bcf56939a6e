package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators for long-lived parquet datasets — the
  * jobs a 100 TB corpus needs on a schedule, not per query.
  */
object Maintenance {

  /** Small-file compaction: rewrite a parquet dataset into
    * ~`targetFileBytes` files. Incremental pipelines (one file per run,
    * `coalesce(1)` loads) accumulate thousands of small files; every
    * downstream scan then pays per-file open/footer costs and the
    * driver pays listing. Compaction sizes the rewrite from the ACTUAL
    * on-disk byte size (Hadoop `getContentSummary`, not a row count —
    * no data scan to plan the job) and writes via a fresh temp dir +
    * two renames so a crashed compaction never leaves a half-written
    * dataset in place.
    *
    * Returns the number of output files written.
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(fsPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(s"$path.__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(s"$path.__compact_old")
    spark.read.parquet(path).repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    fs.rename(fsPath, old)
    fs.rename(tmp, fsPath)
    fs.delete(old, true)

    fs.listStatus(fsPath).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Incremental (cross-snapshot) exact dedup: drop incoming documents
    * whose content hash already exists in the corpus-wide hash index,
    * dedup the survivors among themselves, and append their hashes to
    * the index. The index holds ONE short row per unique document ever
    * accepted — the only state the 100 TB ingest loop carries — and
    * both probes are hash-keyed joins (a left-anti against the index,
    * then the in-batch keep-min rule).
    *
    * Returns the accepted (previously unseen, in-batch-deduped) rows.
    */
  def incrementalDedup(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String
  ): DataFrame = {
    val hashed = batch.withColumn("__h", md5(col(textCol)))
    val indexExists = {
      val p = new org.apache.hadoop.fs.Path(indexPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val fresh =
      if (indexExists)
        hashed.join(spark.read.parquet(indexPath), Seq("__h"), "left_anti")
      else hashed
    val accepted = Dedup
      .dedupExact(fresh, idCol, textCol)
      .localCheckpoint() // settle survivors BEFORE the index grows
    accepted
      .select(col("__h"))
      .distinct()
      .write
      .mode("append")
      .parquet(indexPath)
    accepted.drop("__h")
  }
}
