package graft

import graft.operators.Vocab
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dictionary encoding: dense lexicographic token ids must equal the
  * single-node sorted-distinct rank on any input, and the slice encode
  * hop must round-trip.
  */
class VocabSpec extends AnyFunSuite {

  lazy val spark = GraftSession
    .builder("graft-vocab-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  test("build: ids are the dense lexicographic rank; counts exact (incl. unicode, many partitions)") {
    val texts = Seq(
      "pear apple apple zebra",
      "Ångström apple ねこ zebra zebra",
      "apple 123 !bang pear"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // nParts far above the vocab size: empty range partitions must not
    // perturb the prefix
    val got = Vocab
      .build(df, "text", nParts = 16)
      .collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"), r.getAs[Long]("token_id")))
      .sortBy(_._3)
    val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    val expected = words
      .groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }
      .toSeq
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((w, c), i) => (w, c, i.toLong) }
    // Spark string order is binary UTF-8, as Scala's String ordering is
    // UTF-16 code-unit order — identical for these (no surrogates).
    assert(got.toSeq == expected, s"ids must be the sorted-distinct rank:\n$got\nvs\n$expected")
  }

  test("build: empty corpus yields an empty vocabulary") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Vocab.build(df, "text").count() == 0L)
  }

  test("encodeSlices round-trips: decoding by id join restores every non-empty token") {
    val df = (0 until 40)
      .map(i => (i.toLong, (0 to i % 5).map(j => s"w${(i + j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val vocab = Vocab.build(df, "text").localCheckpoint()
    val slices = graft.operators.Packing
      .manifest(graft.operators.Packing.layout(df, "doc_id", "text", 4), "doc_id", 16L)
      .filter(col("first_pack") === 0)
      .select(col("doc_id"), col("start_tok"))
      .join(df, Seq("doc_id"))
      .select(col("doc_id"), col("start_tok"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "token")))
      .withColumn("gpos", col("start_tok") + col("pos"))
      .filter(col("gpos") < 16)
      .select(
        expr("gpos div 16").as("pack_id"),
        (col("gpos") % 16).as("pos_in_pack"),
        col("doc_id"),
        col("token")
      )
    val encoded = Vocab.encodeSlices(slices, vocab)
    val decoded = encoded
      .join(vocab.select(col("token"), col("token_id")), Seq("token_id"))
      .select(col("pack_id"), col("pos_in_pack"), col("doc_id"), col("token"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val original = slices
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(decoded == original, "encode → decode must restore the token stream")
    assert(encoded.count() == original.size.toLong, "one id row per slice position")
  }

  test("OOV contract: unkId keeps positions gapless; None drops them; pack_export interlocks") {
    val slices = Seq(
      (0L, 0L, 1L, "known"),
      (0L, 1L, 1L, "missing"),
      (0L, 2L, 2L, "known")
    ).toDF("pack_id", "pos_in_pack", "doc_id", "token")
    val vocab = Seq(("known", 7L)).toDF("token", "token_id")
    // silent-drop path: the OOV position vanishes, the hole stays
    // visible in packArrays' positions array
    val dropped = Vocab.packArrays(slices, vocab).collect()
    assert(dropped.length == 1)
    assert(dropped(0).getAs[scala.collection.Seq[Long]]("positions").toSeq == Seq(0L, 2L))
    // unk path: positions gapless, the gap carries the reserved id
    val unk = Vocab.packArrays(slices, vocab, unkId = Some(99L)).collect()
    assert(unk(0).getAs[scala.collection.Seq[Long]]("positions").toSeq == Seq(0L, 1L, 2L))
    assert(unk(0).getAs[scala.collection.Seq[Long]]("token_ids").toSeq == Seq(7L, 99L, 7L))
    // pack_export refuses the silent drop: vocab frozen on a PARTIAL
    // corpus, export of the full stream must fail loudly without
    // --unk_id and land unk ids with it
    val root = java.nio.file.Files.createTempDirectory("graft-oov").toString
    val docs = (0 until 10)
      .map(i => (i.toLong, s"a$i b${i % 3}"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$root/docs")
    docs.filter(col("doc_id") < 5).write.parquet(s"$root/half")
    graft.pipeline.PipelineRunner.run(
      Array("--maintenance", "pack_ingest", "--batch", s"$root/docs",
        "--state", s"$root/st", "--out", s"$root/man", "--applied_id", "0", "--budget", "8"),
      spark
    )
    graft.pipeline.PipelineRunner.run(
      Array("--maintenance", "build_vocab", "--docs", s"$root/half", "--out", s"$root/vocab"),
      spark
    )
    val e = intercept[IllegalArgumentException](
      graft.pipeline.PipelineRunner.run(
        Array("--maintenance", "pack_export", "--state", s"$root/st",
          "--manifests", s"$root/man", "--docs", s"$root/docs", "--vocab", s"$root/vocab",
          "--out", s"$root/exp_bad", "--from", "0", "--to", "2", "--shards", "1"),
        spark
      )
    )
    assert(e.getMessage.contains("OOV"))
    graft.pipeline.PipelineRunner.run(
      Array("--maintenance", "pack_export", "--state", s"$root/st",
        "--manifests", s"$root/man", "--docs", s"$root/docs", "--vocab", s"$root/vocab",
        "--out", s"$root/exp", "--from", "0", "--to", "2", "--shards", "1",
        "--unk_id", "-1"),
      spark
    )
    val exp = spark.read.parquet(s"$root/exp")
    val vSize = spark.read.parquet(s"$root/vocab").count()
    exp.collect().foreach { r =>
      val pos = r.getAs[scala.collection.Seq[Long]]("positions")
      assert(pos.toSeq == (0L until pos.length.toLong), "unk export must stay gapless")
      assert(
        r.getAs[scala.collection.Seq[Long]]("token_ids").forall(id => id == -1L || (id >= 0 && id < vSize))
      )
    }
    assert(
      exp.selectExpr("sum(size(filter(token_ids, x -> x = -1)))").head.getLong(0) > 0L,
      "the OOV positions must land as unk ids"
    )
  }

  test("withIds is a dense permutation when range-bound SAMPLING is active") {
    // Above ~100 rows per range partition Spark samples the bounds per
    // EXECUTION instead of reading them exhaustively; the counts pass
    // and the output pass each evaluate the exchange, so without the
    // localCheckpoint pin they can draw DIFFERENT bounds and the
    // prefix offsets misalign (ids collide/skip — reproduced at 3M
    // tokens by `CurateStress vocab` before the fix). This case keeps
    // the suite at a scale where the sampler is live so removing the
    // pin fails here, not only in the stress tool.
    import spark.implicits._
    val n = 50000L
    val distinct = spark
      .range(n)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions.col("id").cast("string")),
        org.apache.spark.sql.functions.lit("_"),
        org.apache.spark.sql.functions.col("id").cast("string")
      ).as("token"))
    val ids = graft.operators.Vocab.withIds(distinct, "token", 8)
    val stats = ids
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("token_id")),
        org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col("token_id")),
        org.apache.spark.sql.functions.countDistinct(org.apache.spark.sql.functions.col("token_id"))
      )
      .head()
    assert(stats.getLong(0) == n && stats.getLong(1) == 0L &&
      stats.getLong(2) == n - 1 && stats.getLong(3) == n,
      s"ids must be the dense permutation 0..${n - 1}: $stats")
    // and id order equals token order on an ordered prefix
    val prefix = ids
      .orderBy(org.apache.spark.sql.functions.col("token"))
      .limit(500)
      .collect()
      .map(_.getAs[Long]("token_id"))
    assert(prefix.toSeq == (0L until 500L), "prefix must rank 0..499")
  }

  test("decodePacks inverts packArrays: text round-trips per pack in position order") {
    val df = (0 until 60)
      .map(i => (i.toLong, (0 to i % 7).map(j => s"tok${(i * 3 + j) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val vocab = Vocab.build(df, "text").localCheckpoint()
    val slices = graft.operators.Packing
      .manifest(graft.operators.Packing.layout(df, "doc_id", "text", 4), "doc_id", 32L)
      .filter(col("first_pack") <= 2)
      .select(col("doc_id"), col("start_tok"))
      .join(df, Seq("doc_id"))
      .select(col("doc_id"), col("start_tok"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "token")))
      .withColumn("gpos", col("start_tok") + col("pos"))
      .filter(col("gpos") < 96)
      .select(
        expr("gpos div 32").as("pack_id"),
        (col("gpos") % 32).as("pos_in_pack"),
        col("doc_id"),
        col("token")
      )
    val decoded = Vocab
      .decodePacks(Vocab.packArrays(slices, vocab), vocab)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val want = slices
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
      .map { case (p, g) => (p, g.sortBy(_._2).map(_._3).mkString(" "), g.length.toLong) }
      .toSeq
      .sortBy(_._1)
    assert(decoded.toSeq == want, "decode(encode(x)) must be x, per pack, in order")
  }

  test("decodePacks: an id missing from the vocab decodes as <unk>, never silently drops") {
    val vocab = Seq(("alpha", 1L, 0L), ("beta", 1L, 1L)).toDF("token", "cnt", "token_id")
    val packs = Seq((0L, Seq(0L, 1L, 2L), Seq(0L, 99L, 1L)))
      .toDF("pack_id", "positions", "token_ids")
    val out = Vocab.decodePacks(packs, vocab).head()
    assert(out.getString(1) == "alpha <unk> beta", out.getString(1))
    assert(out.getLong(2) == 3L, "the unknown id must still count — dropping it would shift alignment")
  }

  test("decode_packs CLI verb decodes a landed export; --from/--to prunes to the range") {
    val root = java.nio.file.Files.createTempDirectory("graft-decode-cli").toString
    val df = (0 until 40)
      .map(i => (i.toLong, (0 to 3).map(j => s"w${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    df.write.parquet(s"$root/docs")
    val vocab = Vocab.build(df, "text")
    vocab.write.parquet(s"$root/vocab")
    val slices = graft.operators.Packing
      .manifest(graft.operators.Packing.layout(df, "doc_id", "text", 4), "doc_id", 16L)
      .select(col("doc_id"), col("start_tok"))
      .join(df, Seq("doc_id"))
      .select(col("doc_id"), col("start_tok"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "token")))
      .withColumn("gpos", col("start_tok") + col("pos"))
      .select(
        expr("gpos div 16").as("pack_id"),
        (col("gpos") % 16).as("pos_in_pack"),
        col("doc_id"),
        col("token")
      )
    Vocab.packArrays(slices, vocab).write.parquet(s"$root/packs")
    graft.pipeline.PipelineRunner.run(
      Array(
        "--maintenance", "decode_packs",
        "--packs", s"$root/packs",
        "--vocab", s"$root/vocab",
        "--out", s"$root/decoded",
        "--from", "0", "--to", "1"
      ),
      spark
    )
    val got = spark.read.parquet(s"$root/decoded").collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L, "range prune must keep exactly pack 0")
    assert(got.head.getLong(2) == 16L, "pack 0 is budget-full: 16 decoded tokens")
    assert(got.head.getString(1).split(" ").length == 16)
  }

  // ------------------------------------------------------------------
  // coverageCurve
  // ------------------------------------------------------------------

  private def coverageMap(df: org.apache.spark.sql.DataFrame, targets: Seq[Long], nParts: Int) =
    Vocab
      .coverageCurve(df, "text", targets, nParts)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("coverageCurve: hand fixture — exact type counts at every target") {
    // counts: a:4 b:3 c:1, total 8.
    // 50% needs cum >= 4  -> a alone (cum 4·1000 >= 500·8=4000): 1 type
    // 90% needs cum·1000 >= 7200 -> a+b cum 7000 < 7200: 3 types
    val df = Seq((1L, "a a a b b c"), (2L, "a b")).toDF("doc_id", "text")
    val got = coverageMap(df, Seq(500L, 900L, 950L, 990L), nParts = 4)
    assert(got(500L) == ((1L, 3L, 8L)))
    assert(got(900L) == ((3L, 3L, 8L)))
    assert(got(950L) == ((3L, 3L, 8L)))
    assert(got(990L) == ((3L, 3L, 8L)))
  }

  test("coverageCurve: partition count never changes the answer (two-pass prefix correctness)") {
    val rnd = new scala.util.Random(1723)
    // Zipf-ish random corpus: token ids drawn quadratically skewed.
    val docs = (0L until 200L).map { i =>
      val toks = (0 until 40).map { _ =>
        val r = rnd.nextDouble(); s"t${(r * r * 300).toInt}"
      }
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val targets = Seq(100L, 500L, 900L, 990L, 1000L)
    val one = coverageMap(df, targets, nParts = 1)
    val many = coverageMap(df, targets, nParts = 13)
    assert(one == many, s"nParts must be invisible: $one vs $many")
    // Driver replay: exact expected counts from the raw corpus.
    val counts = docs
      .flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val cums = counts.scanLeft(0L)(_ + _._2).tail
    targets.foreach { m =>
      val exp = cums.indexWhere(c => c * 1000 >= m * total) + 1
      assert(one(m)._1 == exp.toLong, s"target $m: got ${one(m)._1}, want $exp")
      assert(one(m)._2 == counts.length.toLong && one(m)._3 == total)
    }
  }

  test("coverageCurve: 1000-milli target needs the whole vocabulary") {
    val df = Seq((1L, "x y z z")).toDF("doc_id", "text")
    assert(coverageMap(df, Seq(1000L), 4)(1000L)._1 == 3L)
  }

  test("vocab_coverage CLI verb lands the library's curve") {
    val root = java.nio.file.Files.createTempDirectory("graft-cov-cli").toString
    val df = Seq((1L, "a a a b b c"), (2L, "a b")).toDF("doc_id", "text")
    df.write.parquet(s"$root/docs")
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "vocab_coverage", "--docs", s"$root/docs",
      "--targets", "500,900", "--out", s"$root/curve"), spark)
    val got = spark.read.parquet(s"$root/curve")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val lib = Vocab.coverageCurve(df, "text", Seq(500L, 900L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == lib)
  }

  test("coverageCurve interlocks: empty corpus and out-of-range targets fail loudly") {
    val empty = Seq((1L, " ")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      Vocab.coverageCurve(empty, "text")
    }.getMessage.contains("empty corpus"))
    val ok = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      Vocab.coverageCurve(ok, "text", Seq(0L))
    }.getMessage.contains("milli"))
    assert(intercept[IllegalArgumentException] {
      Vocab.coverageCurve(ok, "text", Seq(1001L))
    }.getMessage.contains("milli"))
    assert(intercept[IllegalArgumentException] {
      Vocab.coverageCurve(ok, "text", Seq.empty)
    }.getMessage.contains("at least one"))
  }
}
