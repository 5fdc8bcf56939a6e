package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Schema-drift-tolerant parquet ingestion.
  *
  * A multi-year crawl archive is written by many generator versions:
  * columns appear and disappear, integer ids widen, timestamps flip
  * between epoch-longs, TIMESTAMP_NTZ, and tz-adjusted TIMESTAMP (the
  * reference's own events feed did exactly this — see
  * `CoreQueries.normalizeEventTs`). Spark's `mergeSchema` option only
  * merges IDENTICAL column types, so a type-widened archive fails the
  * footer merge outright; reading every batch separately and unioning
  * plans one scan per BATCH — at 10⁴ crawl batches that is 10⁴ scan
  * operators in one plan.
  *
  * This reader does neither: it groups batch directories by their
  * footer schema fingerprint and plans ONE scan per distinct schema
  * VERSION (generator versions are few — single digits — no matter how
  * many batches each produced), conforms each version to the caller's
  * target schema with lossless casts only, and unions the conformed
  * branches. Predicate pushdown and column pruning operate per branch:
  * a filter on a target column reaches every version's parquet scan in
  * its OWN type (Catalyst pushes the comparison through the cast where
  * safe), and a narrow projection prunes each scan independently.
  *
  * 100 TB posture: driver metadata cost is one footer read per batch
  * directory at plan time — O(batches) calls but bytes-tiny (footers,
  * not data), and amortizable by passing an explicit `schemaOf`
  * mapping maintained by the ingest job (mirroring the span state's
  * `_segs` manifest pattern). Executor-side cost is identical to a
  * plain multi-path scan.
  */
object Drift {

  /** Lossless-cast rule: Catalyst's `canUpCast` lattice (integral
    * widening, float→double, decimal widening, anything→string is NOT
    * included there) plus the session-TZ reinterpretation of
    * TIMESTAMP_NTZ — safe under this engine's pinned-UTC sessions,
    * where naive and tz-adjusted timestamps share one epoch.
    */
  private[graft] def lossless(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (TimestampNTZType, TimestampType) => true
      case (f, t) =>
        org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f, t)
    }

  /** Conforms one batch to `target`: target columns present in the
    * batch are lossless-cast to the target type, columns the batch
    * predates are null-filled at the target type, and batch-only
    * columns are projected away. A lossy mapping (long→int, double→
    * float, string→anything) throws unless `allowLossy` — silent
    * narrowing is how an archive loses ids.
    */
  def conform(df: DataFrame, target: StructType, allowLossy: Boolean = false): DataFrame = {
    val have = df.schema.map(f => f.name -> f).toMap
    val cols = target.map { tf =>
      have.get(tf.name) match {
        case None =>
          lit(null).cast(tf.dataType).as(tf.name)
        case Some(sf) if sf.dataType == tf.dataType =>
          col(tf.name)
        case Some(sf) =>
          require(
            allowLossy || lossless(sf.dataType, tf.dataType),
            s"lossy conform for column '${tf.name}': ${sf.dataType.catalogString} → " +
              s"${tf.dataType.catalogString} (pass allowLossy=true to permit)"
          )
          col(tf.name).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols: _*)
  }

  /** Reads a root directory whose immediate subdirectories are parquet
    * batches with (possibly) drifting schemas, conformed to `target`.
    * One scan per distinct footer schema; a root containing parquet
    * files directly is treated as a single batch.
    */
  def readConformed(
      spark: SparkSession,
      root: String,
      target: StructType,
      allowLossy: Boolean = false
  ): DataFrame = {
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subdirs = fs
      .listStatus(rootPath)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
      .sorted
    val batches = if (subdirs.isEmpty) Seq(root) else subdirs.toSeq
    // Footer read per batch dir (schema only — no data): group by the
    // schema fingerprint so the PLAN scales with generator versions,
    // not with batch count.
    val byVersion: Seq[(StructType, Seq[String])] = batches
      .map(b => (spark.read.parquet(b).schema, b))
      .groupBy(_._1)
      .map { case (s, bs) => (s, bs.map(_._2)) }
      .toSeq
      .sortBy(_._2.head)
    byVersion
      .map { case (_, dirs) =>
        conform(spark.read.parquet(dirs: _*), target, allowLossy)
      }
      .reduce(_.unionByName(_))
  }
}
