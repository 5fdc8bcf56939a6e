package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout + footer-stats data skipping: the clustered write
  * must make narrow predicates on EITHER interleaved column touch a
  * strict subset of files (a round-robin layout touches all of them),
  * footer stats must agree with the data, and the pruned read must
  * return exactly what a full scan returns.
  */
class ZorderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-zorder-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf = "/root/testdata/sf0.01"
  // Enough files that top-z-bit blocks are finer than the probe slice:
  // with 16 range-files the curve fixes ~2 bits per dimension, so a
  // 1/16-wide slice on either column maps to ~4-6 files, not "most".
  val nFiles = 16

  lazy val zPath: String = {
    val out = s"/tmp/graft-zorder-${java.util.UUID.randomUUID().toString.take(8)}"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    operators.Maintenance.zorderWrite(spark, li, "l_partkey", "l_suppkey", out, nFiles)
    out
  }

  lazy val rrPath: String = {
    val out = s"/tmp/graft-rr-${java.util.UUID.randomUUID().toString.take(8)}"
    spark.read
      .parquet(s"$sf/lineitem.parquet")
      .repartition(nFiles)
      .write
      .mode("overwrite")
      .parquet(out)
    out
  }

  private def overlapping(path: String, c: String, lo: Long, hi: Long): Int =
    operators.Maintenance
      .fileStats(spark, path, Seq(c))
      .filter(col("min_value") <= hi && col("max_value") >= lo)
      .count()
      .toInt

  test("footer stats match the data they describe") {
    def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val footer = operators.Maintenance
      .fileStats(spark, zPath, Seq("l_partkey"))
      .select("file", "min_value", "max_value")
      .collect()
      .map(r => (base(r.getString(0)), (r.getLong(1), r.getLong(2))))
      .toMap
    val data = spark.read
      .parquet(zPath)
      .groupBy(input_file_name().as("file"))
      .agg(min("l_partkey").as("mn"), max("l_partkey").as("mx"))
      .collect()
      .map(r => (base(r.getString(0)), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(footer.size == nFiles)
    assert(footer == data, "footer stats must agree with per-file data min/max")
  }

  test("z-order prunes narrow predicates on both dimensions; round-robin cannot") {
    val (pLo, pHi, sLo, sHi) = {
      val mm = spark.read
        .parquet(s"$sf/lineitem.parquet")
        .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
        .head()
      val (pmn, pmx, smn, smx) = (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
      // a ~1/16-wide slice of each domain
      (pmn, pmn + (pmx - pmn) / 16, smn, smn + (smx - smn) / 16)
    }
    val zPart = overlapping(zPath, "l_partkey", pLo, pHi)
    val zSupp = overlapping(zPath, "l_suppkey", sLo, sHi)
    val rrPart = overlapping(rrPath, "l_partkey", pLo, pHi)
    assert(rrPart == nFiles, "round-robin layout should leave every file overlapping")
    assert(zPart <= nFiles / 2, s"z-order should prune most files on x (got $zPart/$nFiles)")
    assert(zSupp <= nFiles / 2, s"z-order should prune most files on y (got $zSupp/$nFiles)")
  }

  test("zorderWrite accepts int-typed key columns") {
    import spark.implicits._
    val out = s"/tmp/graft-zint-${java.util.UUID.randomUUID().toString.take(8)}"
    val df = (0 until 100).map(i => (i, i * 7 % 100)).toDF("a", "b") // IntegerType keys
    operators.Maintenance.zorderWrite(spark, df, "a", "b", out, 4)
    assert(spark.read.parquet(out).count() == 100)
  }

  test("a file with no stats for the prune column is always read (conservative)") {
    val dir = s"/tmp/graft-nostat-${java.util.UUID.randomUUID().toString.take(8)}"
    spark.read.parquet(s"$sf/lineitem.parquet").repartition(4).write.parquet(dir)
    // Append a file that lacks l_partkey entirely (schema evolution):
    // its footer carries no stats for the prune column, so pruning must
    // treat its range as unknown and keep it for ANY predicate.
    spark.read
      .parquet(s"$sf/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderkey"))
      .coalesce(1)
      .write
      .mode("append")
      .parquet(dir)
    val (df, kept, total) =
      operators.Maintenance.prunedRead(spark, dir, "l_partkey", -100L, -1L)
    assert(total == 5)
    assert(kept == 1, "impossible range prunes every file WITH stats; the stats-less one stays")
    assert(df.isEmpty, "the stats-less file's rows read l_partkey as null and fail the filter")
  }

  test("pruned read with a range outside every file returns empty, not an error") {
    val (df, kept, total) = operators.Maintenance.prunedRead(spark, zPath, "l_partkey", -100L, -1L)
    assert(kept == 0 && total == nFiles)
    assert(df.isEmpty)
    assert(df.columns.contains("l_partkey"), "schema preserved on the empty path")
  }

  test("pruned read equals the full-scan filter") {
    val mm = spark.read.parquet(s"$sf/lineitem.parquet").agg(min("l_partkey"), max("l_partkey")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 16)
    val (pruned, kept, total) = operators.Maintenance.prunedRead(spark, zPath, "l_partkey", lo, hi)
    val full = spark.read.parquet(zPath).filter(col("l_partkey") >= lo && col("l_partkey") <= hi)
    assert(kept < total, "pruning must actually skip files on the z-ordered layout")
    assert(pruned.count() == full.count())
    val key = Seq("l_orderkey", "l_linenumber")
    assert(pruned.select(key.map(col): _*).except(full.select(key.map(col): _*)).isEmpty)
    assert(full.select(key.map(col): _*).except(pruned.select(key.map(col): _*)).isEmpty)
  }
}
