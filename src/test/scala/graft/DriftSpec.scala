package graft

import graft.sources.Drift
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Schema-drift reader: conformance rules, one-scan-per-version
  * planning, and the lossy-cast guard.
  */
class DriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-drift-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private val target = StructType(
    Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType)
    )
  )

  test("conform: lossless upcasts, null-fill for predated columns, extras dropped") {
    val batch = Seq((1, "a", 1.5f, "junk"), (2, "b", 2.5f, "junk"))
      .toDF("id", "name", "score", "extra") // id INT, score FLOAT
    val out = Drift.conform(batch, target)
    assert(out.schema.map(f => f.name -> f.dataType) == target.map(f => f.name -> f.dataType))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "a", 1.5), (2L, "b", 2.5)))

    val predates = Seq((3, "c")).toDF("id", "name") // no score column
    val filled = Drift.conform(predates, target).collect().head
    assert(filled.getLong(0) == 3L && filled.isNullAt(2))
  }

  test("conform: TIMESTAMP_NTZ reinterprets to the session-TZ timestamp (UTC pin)") {
    val tsTarget = StructType(Seq(StructField("ts", TimestampType)))
    val us = 1541121934796000L
    val ntz = Seq(1).toDF("i").select(timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"))
    val out = Drift.conform(ntz, tsTarget)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).collect().head.getLong(0) == us)
  }

  test("conformColumn: the single-column form shares the lossless lattice (events reader's NTZ case)") {
    val us = 1541121934796000L
    val ntz = Seq(1).toDF("i").select(timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"))
    val out = Drift.conformColumn(ntz, "ts", TimestampType)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).collect().head.getLong(0) == us)
    // same-type is a no-op; lossy throws with the column named
    assert(Drift.conformColumn(out, "ts", TimestampType).schema == out.schema)
    val e = intercept[IllegalArgumentException](
      Drift.conformColumn(Seq(Long.MaxValue).toDF("id"), "id", IntegerType)
    )
    assert(e.getMessage.contains("'id'"))
    assert(
      Drift
        .conformColumn(Seq(Long.MaxValue).toDF("id"), "id", IntegerType, allowLossy = true)
        .schema("id")
        .dataType == IntegerType
    )
  }

  test("conform: lossy mapping throws unless allowLossy") {
    val wide = Seq((Long.MaxValue, "x", 1.0)).toDF("id", "name", "score")
    val narrow = StructType(
      Seq(
        StructField("id", IntegerType),
        StructField("name", StringType),
        StructField("score", DoubleType)
      )
    )
    val e = intercept[IllegalArgumentException](Drift.conform(wide, narrow))
    assert(e.getMessage.contains("lossy conform for column 'id'"))
    assert(Drift.conform(wide, narrow, allowLossy = true).schema("id").dataType == IntegerType)
  }

  private def writeBatches(): String = {
    val root = Files.createTempDirectory("graft-drift").toString
    // v1 ×2 batches (same schema — must share one scan), v2, v3
    Seq((1, "a")).toDF("id", "name").write.parquet(s"$root/b0")
    Seq((2, "b")).toDF("id", "name").write.parquet(s"$root/b1")
    Seq((3L, "c", 3.5f)).toDF("id", "name", "score").write.parquet(s"$root/b2")
    Seq((4L, "d", 4.5, "v3")).toDF("id", "name", "score", "crawler").write.parquet(s"$root/b3")
    root
  }

  test("readConformed: values union across versions with per-version rules") {
    val root = writeBatches()
    val out = Drift.readConformed(spark, root, target)
    assert(out.schema == target)
    val rows = out
      .collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(
      rows == Set(
        (1L, "a", None),
        (2L, "b", None),
        (3L, "c", Some(3.5)),
        (4L, "d", Some(4.5))
      )
    )
  }

  test("readConformed: plans one parquet scan per distinct schema, not per batch") {
    val root = writeBatches() // 4 batch dirs, 3 distinct schemas
    val plan = Drift
      .readConformed(spark, root, target)
      .queryExecution
      .executedPlan
      .toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 3, s"expected 3 scans (one per schema version) in:\n$plan")
  }

  test("readConformed: filter on a target column pushes into every version's scan") {
    val root = writeBatches()
    val plan = Drift
      .readConformed(spark, root, target)
      .filter(col("name") === "c")
      .queryExecution
      .executedPlan
      .toString
    // every scan branch carries the pushed predicate
    val pushed = "PushedFilters: \\[.*EqualTo\\(name,c\\)".r.findAllIn(plan).length
    assert(pushed == 3, s"expected the name filter pushed to all 3 scans in:\n$plan")
  }

  test("readConformed: a flat directory of parquet files is one batch") {
    val root = Files.createTempDirectory("graft-drift-flat").toString
    Seq((9, "z")).toDF("id", "name").write.mode("overwrite").parquet(root) // parquet dir IS the root
    val out = Drift.readConformed(spark, root, target)
    assert(out.collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("schema manifest: one plan-time file read replaces per-batch footers; stale stays correct") {
    val root = writeBatches() // 4 batch dirs, 3 distinct schemas
    assert(Drift.writeSchemaManifest(spark, root) == 4)
    // manifest-served read: identical values and identical plan shape
    val out = Drift.readConformed(spark, root, target)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    val scans = "Scan parquet".r.findAllIn(out.queryExecution.executedPlan.toString).length
    assert(scans == 3, "manifest-served read keeps one scan per version")
    // stale manifest: a batch appended AFTER the manifest (v1's schema
    // again) must footer-probe and MERGE into v1's scan group — the
    // normalized-DDL key joins manifest- and footer-sourced schemas
    Seq((5, "e")).toDF("id", "name").write.parquet(s"$root/b4")
    val out2 = Drift.readConformed(spark, root, target)
    assert(out2.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    val scans2 = "Scan parquet".r.findAllIn(out2.queryExecution.executedPlan.toString).length
    assert(scans2 == 3, "stale-manifest fallback merges same-version batches into one scan")
    // refresh picks up the new batch
    assert(Drift.writeSchemaManifest(spark, root) == 5)
  }

  test("appendSchemaEntry: ingest-side manifest upkeep keeps one scan per version") {
    val root = writeBatches()
    assert(Drift.writeSchemaManifest(spark, root) == 4)
    // an ingest job lands a new v1-schema batch and appends its OWN
    // entry (it already knows the schema) — no footer rescan anywhere
    val b4 = Seq((5, "e")).toDF("id", "name")
    b4.write.parquet(s"$root/b4")
    Drift.appendSchemaEntry(spark, root, "b4", b4.schema)
    val out = Drift.readConformed(spark, root, target)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    val scans = "Scan parquet".r.findAllIn(out.queryExecution.executedPlan.toString).length
    assert(scans == 3, "appended entry must merge into its version's scan group")
    // rewrite-in-place refresh: the batch is rewritten under a LATER
    // schema and its entry replaced — it must move to that version's
    // group, not linger under the stale one
    val b4v2 = Seq((6L, "f", 6.5f)).toDF("id", "name", "score")
    b4v2.write.mode("overwrite").parquet(s"$root/b4")
    Drift.appendSchemaEntry(spark, root, "b4", b4v2.schema)
    val out2 = Drift.readConformed(spark, root, target)
    assert(out2.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 6L))
    val scans2 = "Scan parquet".r.findAllIn(out2.queryExecution.executedPlan.toString).length
    assert(scans2 == 3, "refreshed entry must re-home the batch to the v2 scan group")
  }

  test("drift_manifest CLI verb writes the manifest") {
    val root = writeBatches()
    graft.pipeline.PipelineRunner.run(
      Array("--maintenance", "drift_manifest", "--root", root),
      spark
    )
    val out = Drift.readConformed(spark, root, target)
    val scans = "Scan parquet".r.findAllIn(out.queryExecution.executedPlan.toString).length
    assert(scans == 3 && out.count() == 4)
  }

  test("q109 schema-drift query returns per-lang rows") {
    val out = queries.CoreQueries.q109SchemaDrift(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    val cols = out.columns.toSet
    assert(
      cols == Set("lang", "n_docs", "sum_chars", "q_cents", "with_source", "id_lo", "id_hi")
    )
    // v1 batches predate source: with_source < n_docs summed corpus-wide
    val tot = out.agg(sum("n_docs"), sum("with_source")).collect().head
    assert(tot.getLong(1) < tot.getLong(0))
  }
}
