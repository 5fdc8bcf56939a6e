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
