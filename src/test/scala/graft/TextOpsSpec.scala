package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the chunking / decontamination / heavy-hitter
  * operators beyond the oracle hash-match: coverage and overlap of the
  * chunk grid, split-disjointness and recomputed containment for
  * decontamination, and the sketch-vs-exact bound for heavy hitters.
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-textops-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("q55 chunk grid: contiguous indices, correct sizes, full coverage") {
    val docTok = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val chunks = queries.TextQueries
      .q55Chunk(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    assert(chunks.keySet == docTok.keySet, "every document must be chunked")
    chunks.foreach { case (doc, rows) =>
      val n = docTok(doc)
      val byIdx = rows.sortBy(_._2)
      assert(byIdx.map(_._2).toSeq == (0 until byIdx.length), s"doc $doc: gap in chunk indices")
      assert(byIdx.length == (n - 1) / 48 + 1, s"doc $doc: wrong chunk count for n=$n")
      byIdx.foreach { case (_, i, len) =>
        assert(len == math.min(64, n - i * 48), s"doc $doc chunk $i: bad length $len (n=$n)")
      }
      // stride 48 + size 64 ⇒ chunk i covers tokens [48i+1, 48i+len]; the
      // grid covers [1, n] with 16-token overlaps between full chunks.
      val covered = byIdx.flatMap { case (_, i, len) => (48 * i + 1) to (48 * i + len) }.toSet
      assert(covered == (1 to n).toSet, s"doc $doc: chunk grid does not cover all tokens")
    }
  }

  test("q55 chunk grid is lossless: stride-prefix reassembly rebuilds every document") {
    // Overlapping chunks (size 64, stride 48) must still be a lossless
    // representation: concatenating each chunk's first `stride` tokens
    // (the last chunk truncates naturally) re-derives the original
    // token sequence for EVERY document — the packing/training consumer
    // can always reconstruct the corpus from chunks alone.
    val stride = 48
    val base = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .withColumn("n", size(col("t")))
    val rebuilt = base
      .select(
        col("doc_id"),
        col("t"),
        explode(expr(s"sequence(0, (n - 1) div $stride)")).as("i")
      )
      .select(
        col("doc_id"),
        col("t"),
        col("i"),
        slice(col("t"), col("i") * stride + 1, lit(stride)).as("piece")
      )
      .groupBy(col("doc_id"), col("t"))
      .agg(
        flatten(array_sort(collect_list(struct(col("i"), col("piece"))))
          .getField("piece")).as("rt")
      )
    val bad = rebuilt.filter(col("rt") =!= col("t")).count()
    assert(bad == 0, s"$bad documents failed chunk reassembly")
  }

  test("q54 decontamination: split disjoint, containment recomputable from raw text") {
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"ev_$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 10 == 0
    }
    val rows = queries.TextQueries.q54Decontaminate(spark, sf).collect()
    assert(rows.nonEmpty, "fixture should contain cross-split near-dups")
    val texts = spark.read
      .parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    def shingles(t: String): Set[(String, String, String)] =
      t.split("\\s+").toSeq.sliding(3).filter(_.length == 3).map { case Seq(a, b, c) => (a, b, c) }.toSet
    rows.foreach { r =>
      val (train, eval_) = (r.getLong(0), r.getLong(1))
      assert(!isEval(train), s"train doc $train hashed into the eval split")
      assert(isEval(eval_), s"eval doc $eval_ not in the eval split")
      val (sa, sb) = (shingles(texts(train)), shingles(texts(eval_)))
      val contain = (sa intersect sb).size.toDouble / sa.size
      assert(math.abs(contain - r.getDouble(3)) < 1e-9, s"pair ($train,$eval_): containment mismatch")
      assert(contain >= 0.5)
    }
  }

  test("native graft_shingles is bit-identical to the HOF shingle chain") {
    import queries.TextQueries
    val d = spark.read.parquet(s"$sf/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select(col("doc_id"), col("sh_ints"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
        .toMap
    val native = rows(TextQueries.withShingles(d))
    val hof = rows(TextQueries.withShinglesHof(d))
    assert(native.keySet == hof.keySet)
    // Exact element order too: both dedup to first-occurrence order.
    native.foreach { case (id, sh) =>
      assert(sh == hof(id), s"doc $id: native and HOF shingles differ")
    }
    assert(native.nonEmpty && native.values.exists(_.nonEmpty))
    // Edge cases: under 3 tokens → row filtered in both forms.
    import spark.implicits._
    val tiny = Seq((1L, "only two"), (2L, "a b c")).toDF("doc_id", "text")
    assert(rows(TextQueries.withShingles(tiny)).keySet == Set(2L))
    assert(rows(TextQueries.withShinglesHof(tiny)).keySet == Set(2L))
  }

  test("materializeFeatures: parquet-backed feature tables give identical results") {
    import queries.TextQueries
    def snap(): Map[String, Set[String]] = Map(
      "q21" -> TextQueries.q21NgramJaccard(spark, sf).collect().map(_.toString).toSet,
      "q41" -> TextQueries.q41Tfidf(spark, sf).collect().map(_.toString).toSet,
      "q52" -> TextQueries.q52VocabMap(spark, sf).collect().map(_.toString).toSet,
      "q54" -> TextQueries.q54Decontaminate(spark, sf).collect().map(_.toString).toSet
    )
    TextQueries.clearFeatureMemo()
    val viaCheckpoint = snap()
    val state = java.nio.file.Files.createTempDirectory("graft-feat-").toString
    TextQueries.clearFeatureMemo()
    val (shPath, tokPath) = TextQueries.materializeFeatures(spark, sf, state)
    // The memo now points at the parquet reads — prove it by checking the
    // physical plan scans the state dir, not the documents table.
    assert(new java.io.File(shPath).exists() && new java.io.File(tokPath).exists())
    // (q41 still scans documents.parquet once — the corpus-size count —
    // but the token instances must come from the durable table.)
    val plan = TextQueries.q41Tfidf(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains(state), s"q41 should scan the materialized token table under $state:\n$plan")
    val viaParquet = snap()
    assert(viaParquet == viaCheckpoint, "durable path must be result-identical")
    viaCheckpoint.foreach { case (q, s) => assert(s.nonEmpty, s"$q fixture empty") }
    // The pair table is durable too: after the bench's evict→re-point
    // cycle, q21 must SCAN the state dir (no localCheckpoint rebuild)
    // and still match.
    TextQueries.clearFeatureMemo()
    TextQueries.pointFeaturesAt(spark, sf, state)
    val q21Plan = TextQueries.q21NgramJaccard(spark, sf).queryExecution.executedPlan.toString
    assert(q21Plan.contains(s"$state/pairs"), s"q21 should scan the durable pair table:\n$q21Plan")
    assert(
      TextQueries.q21NgramJaccard(spark, sf).collect().map(_.toString).toSet == viaCheckpoint("q21"),
      "durable pair table must be result-identical"
    )
    TextQueries.clearFeatureMemo()
  }

  test("q56 heavy hitters: ranks 1..10, counts descending, sketch within bound") {
    val rows = queries.TextQueries
      .q56HeavyHitters(spark, sf)
      .orderBy(col("rank"))
      .collect()
    assert(rows.map(_.getInt(2)).toSeq == (1 to rows.length), "ranks must be 1..k")
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    assert(rows.forall(_.getBoolean(3)), "every sketch estimate must be within the 1% bound")
  }
}
