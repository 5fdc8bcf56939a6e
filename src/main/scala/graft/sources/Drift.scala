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
    *
    * Batch-dir schemas come from the `_schemas` manifest when one
    * exists ([[writeSchemaManifest]] — the ingest job maintains it, so
    * plan-time driver work is ONE small file read however many batches
    * the archive holds); dirs the manifest doesn't list (appended
    * since) fall back to a footer read each, so a stale manifest is a
    * slow plan, never a wrong one. (A manifest entry that MISSTATES a
    * batch's schema fails at scan time — parquet rejects the
    * mismatched expected schema — it cannot silently mis-conform.)
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
      .map(_.getPath.getName)
      .sorted
    val manifest = readSchemaManifest(fs, rootPath)
    // Group by the normalized DDL string: a manifest-sourced schema and
    // a footer-sourced one for the same version must land in ONE group
    // (StructType equality is metadata-sensitive; DDL is not).
    val byVersion: Seq[Seq[String]] =
      if (subdirs.isEmpty) Seq(Seq(root))
      else
        subdirs.toSeq
          .map { name =>
            val ddl = manifest
              .get(name)
              .getOrElse(spark.read.parquet(s"$root/$name").schema)
              .toDDL
            (ddl, s"$root/$name")
          }
          .groupBy(_._1)
          .values
          .map(_.map(_._2))
          .toSeq
          .sortBy(_.head)
    byVersion
      .map(dirs => conform(spark.read.parquet(dirs: _*), target, allowLossy))
      .reduce(_.unionByName(_))
  }

  private val ManifestFile = "_schemas/manifest.tsv"

  /** Scans every batch dir's footer ONCE and records `<dirname> TAB
    * <schema DDL>` lines under `_schemas/` — after which
    * [[readConformed]]'s plan-time driver cost is one manifest read,
    * not a footer read per batch. Idempotent full refresh; an ingest
    * job appends its own line instead (any writer that just wrote the
    * batch already knows the schema). Batch dir names must not contain
    * tabs or newlines (enforced).
    */
  def writeSchemaManifest(spark: SparkSession, root: String): Int = {
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs
      .listStatus(rootPath)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName)
      .sorted
      .map { name =>
        require(
          !name.exists(c => c == '\t' || c == '\n' || c == '\r'),
          s"batch dir name '$name' contains manifest delimiters"
        )
        s"$name\t${spark.read.parquet(s"$root/$name").schema.toDDL}"
      }
    val tmp = new HPath(rootPath, s"$ManifestFile.tmp")
    val out = fs.create(tmp, true)
    try out.write((entries.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // rename-with-overwrite: readers see the old or new manifest, never
    // a partial one (same protocol as QualityModel's pointer flip)
    org.apache.hadoop.fs.FileContext
      .getFileContext(rootPath.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new HPath(rootPath, ManifestFile), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    entries.length
  }

  private def readSchemaManifest(fs: FileSystem, rootPath: HPath): Map[String, StructType] = {
    val p = new HPath(rootPath, ManifestFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.linesIterator
        .filter(_.nonEmpty)
        .map { line =>
          val i = line.indexOf('\t')
          line.substring(0, i) -> StructType.fromDDL(line.substring(i + 1))
        }
        .toMap
    }
  }
}
