package graft

import graft.operators.Scale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-export-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def freshRows(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(9)
    (1 to 10000).map(i => (rnd.nextLong().abs, s"doc$i")).distinct
  }

  test("hash mode: stable under any input layout, full coverage, within-shard order") {
    import spark.implicits._
    val rows = freshRows()
    val df = rows.toDF("doc_key", "payload")
    val out = Files.createTempDirectory("graft-export").toString + "/corpus"

    val manifest = Scale
      .exportShards(df, "doc_key", 8, out)
      .orderBy("shard")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(manifest.length == 8 && manifest.map(_._2).sum == rows.size.toLong)

    // within-shard order
    val s0 = spark.read
      .parquet(s"$out/shard=${manifest.head._1}")
      .select("doc_key")
      .collect()
      .map(_.getLong(0))
    assert(s0.sameElements(s0.sorted), "within-shard order")

    // layout independence: a scrambled input exports identical content
    val out2 = Files.createTempDirectory("graft-export2").toString + "/corpus"
    Scale.exportShards(df.repartition(13, col("payload")), "doc_key", 8, out2)
    val a = spark.read.parquet(out).select("doc_key", "payload", "shard")
    val b = spark.read.parquet(out2).select("doc_key", "payload", "shard")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "re-export must be content-identical")
  }

  test("range mode: disjoint ordered shard ranges, within-shard order, honest manifest") {
    import spark.implicits._
    val rows = freshRows()
    val out = Files.createTempDirectory("graft-export-r").toString + "/corpus"
    val manifest = Scale
      .exportShards(rows.toDF("doc_key", "payload"), "doc_key", 8, out, mode = "range")
      .orderBy("shard")
      .collect()
      .map(r =>
        (
          r.getInt(0),
          r.getLong(1),
          // null-safe: empty shards carry n_rows=0 and null min/max
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])
        )
      )
    assert(manifest.length == 8, "manifest must enumerate every shard id")
    assert(manifest.map(_._2).sum == rows.size.toLong)
    // shard i's max key < shard i+1's min key (among non-empty shards)
    manifest.filter(_._2 > 0).sliding(2).foreach {
      case Array((s1, _, _, Some(max1)), (s2, _, Some(min2), _)) =>
        assert(max1 < min2, s"shards $s1/$s2 overlap: max=$max1 min=$min2")
      case _ => ()
    }
    assert(spark.read.parquet(out).count() == rows.size.toLong)
    // the writer must not undo the within-shard key order (plan-level
    // guarantee: the (shard, key) sort satisfies its required ordering)
    val firstNonEmpty = manifest.find(_._2 > 0).get._1
    val s0 = spark.read
      .parquet(s"$out/shard=$firstNonEmpty")
      .select("doc_key")
      .collect()
      .map(_.getLong(0))
    assert(s0.sameElements(s0.sorted), "range mode within-shard order")
  }

  test("verifyExport: pristine landing verifies; a lost part-file and silent corruption are caught") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-verify-export").toString
    val out = s"$root/corpus"
    Scale.exportShards(freshRows().toDF("doc_key", "payload"), "doc_key", 8, out)
    val clean = Scale.verifyExport(spark, out).collect()
    assert(clean.length == 8 && clean.forall(_.getBoolean(5)), "pristine export must verify")
    // silent corruption: rewrite shard 3 with the SAME row count and
    // key set but one payload changed — counts and key ranges hold,
    // only the content digest can catch it
    val s3 = spark.read.parquet(s"$out/shard=3").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(s3.nonEmpty)
    val tampered = s3.updated(0, (s3(0)._1, s3(0)._2 + "!"))
    val tmp = s"$root/tampered"
    tampered.toSeq.toDF("doc_key", "payload").coalesce(1).write.parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/shard=3"))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmp), new java.io.File(s"$out/shard=3"))
    val afterTamper = Scale.verifyExport(spark, out).collect()
      .map(r => r.getInt(0) -> r.getBoolean(5)).toMap
    assert(!afterTamper(3), "digest must catch count-preserving corruption")
    assert((0 to 7).filter(_ != 3).forall(afterTamper(_)), "other shards unaffected")
    // lost shard dir: row count catches it
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/shard=5"))
    val afterLoss = Scale.verifyExport(spark, out).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getBoolean(5)))).toMap
    assert(afterLoss(5) == ((0L, false)), "lost shard must report zero rows, not ok")
  }

  test("verifyExport: even-multiplicity corruption (xor-blind) is caught by the sum digest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-verify-even").toString
    val out = s"$root/corpus"
    // a corpus where one row is duplicated (multiplicity 2) — the
    // adversarial surface: an xor of row hashes cancels even
    // multiplicities to zero, so swapping the duplicated pair for a
    // DIFFERENT duplicated pair preserves count, key range, and xor.
    val base = (1 to 500).map(i => (i.toLong, s"doc$i"))
    val dupKey = base.head._1
    val rows = base ++ Seq((dupKey, "twin"), (dupKey, "twin"))
    Scale.exportShards(rows.toDF("doc_key", "payload"), "doc_key", 4, out)
    assert(Scale.verifyExport(spark, out).collect().forall(_.getBoolean(5)))
    // duplicates of one key land in one shard (hash mode) — find it
    val dupShard = spark.read.parquet(out)
      .filter(col("payload") === "twin").select("shard").head().getInt(0)
    val shardRows = spark.read.parquet(s"$out/shard=$dupShard").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // swap the duplicated pair for a different duplicated pair: same
    // row count, same key multiset, even multiplicity on both sides
    val tampered = shardRows.map {
      case (k, "twin") => (k, "evil")
      case other       => other
    }
    assert(tampered.count(_._2 == "evil") == 2, "fixture needs the pair in-shard")
    // prove the tamper is in the xor digest's blind spot: the per-shard
    // xor of row hashes is IDENTICAL before and after the swap
    def shardXor(rs: Seq[(Long, String)]): Long = rs.toDF("doc_key", "payload")
      .agg(bit_xor(xxhash64(col("doc_key"), col("payload")))).head().getLong(0)
    assert(shardXor(shardRows.toSeq) == shardXor(tampered.toSeq),
      "fixture must sit in the xor blind spot, else the test proves nothing")
    val tmp = s"$root/tampered"
    tampered.toSeq.toDF("doc_key", "payload").coalesce(1).write.parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/shard=$dupShard"))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmp), new java.io.File(s"$out/shard=$dupShard"))
    val after = Scale.verifyExport(spark, out).collect()
      .map(r => r.getInt(0) -> r.getBoolean(5)).toMap
    assert(!after(dupShard), "sum digest must catch even-multiplicity corruption")
    assert((0 to 3).filter(_ != dupShard).forall(after(_)), "other shards unaffected")
  }

  test("verifyExport: a legacy xor-digest manifest is refused loudly, not silently passed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-verify-legacy").toString
    val out = s"$root/corpus"
    Scale.exportShards(freshRows().toDF("doc_key", "payload"), "doc_key", 2, out)
    // forge what a pre-upgrade export left behind: same manifest with
    // the digest recorded under the retired xor column name
    val legacy = spark.read.parquet(s"$out.__manifest")
      .withColumnRenamed("content_digest", "content_xor")
    val mTmp = s"$root/legacy_manifest"
    legacy.coalesce(1).write.parquet(mTmp)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out.__manifest"))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(mTmp), new java.io.File(s"$out.__manifest"))
    val e = intercept[IllegalArgumentException](Scale.verifyExport(spark, out))
    assert(e.getMessage.contains("retired xor"), e.getMessage)
    assert(e.getMessage.contains("re-export"), e.getMessage)
  }

  test("verify_export CLI verb passes on a clean landing and names the corrupt shard") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-verify-cli").toString
    val out = s"$root/corpus"
    Scale.exportShards(freshRows().toDF("doc_key", "payload"), "doc_key", 4, out)
    graft.pipeline.PipelineRunner.run(
      Array("--maintenance", "verify_export", "--path", out), spark)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/shard=2"))
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineRunner.run(
        Array("--maintenance", "verify_export", "--path", out), spark)
    }
    assert(e.getMessage.contains("shard=2"), e.getMessage)
  }

  test("verifyExport: map-typed payload columns are excluded from the digest, not fatal") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-verify-map").toString
    val out = s"$root/corpus"
    val df = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("doc_key", "props")
    val manifest = Scale.exportShards(df, "doc_key", 2, out).collect()
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 2L)
    val report = Scale.verifyExport(spark, out).collect()
    assert(report.forall(_.getBoolean(5)), "map-typed export must still verify on the key digest")
  }

  test("empty shards appear in the manifest as explicit zeros") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-export-e").toString + "/corpus"
    // 3 distinct keys into 16 shards: most shards MUST be empty
    val manifest = Scale
      .exportShards(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_key", "payload"), "doc_key", 16, out)
      .collect()
    assert(manifest.length == 16)
    assert(manifest.map(_.getLong(1)).sum == 3L)
    assert(manifest.count(_.getLong(1) == 0L) == 16 - manifest.count(_.getLong(1) > 0L))
  }
}
