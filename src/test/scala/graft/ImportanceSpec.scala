package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Importance

/** DSIR-style importance weighting: bigram extraction semantics
  * (empties dropped, short docs emit nothing), the add-one smoothed
  * integer micro-ratio, a FULL driver-side md5 replay of the whole
  * weight→score chain on a fixture corpus, target-affinity
  * monotonicity, and the deterministic top-k contract.
  */
class ImportanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-importance-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private val Buckets = 64

  /** The engine's portable hash, replayed on the JVM: first 7 hex
    * chars of md5, parsed base-16.
    */
  private def h28(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  private def bigrams(text: String): Seq[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 2) Seq.empty
    else toks.sliding(2).map(p => s"${p(0)} ${p(1)}").toSeq
  }

  private def corpus(rows: (Long, String, Boolean)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "is_target")

  test("importance chain: full driver-side md5 replay on a fixture corpus") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", true),
      (2L, "the quick brown fox sat still", false),
      (3L, "pack my box with five dozen liquor jugs", false),
      (4L, "  leading and   trailing   whitespace here  ", true),
      (5L, "single", false), // no bigram: must not appear in scores
      (6L, "", false), // ditto
      (7L, "the quick brown fox jumps over the lazy dog again", false)
    )
    val raw = corpus(rows: _*)
    val weights =
      Importance.ngramImportanceWeights(raw, "text", "is_target", Buckets)
    val scores =
      Importance.importanceScores(raw, "doc_id", "text", weights, Buckets)

    // Driver replay: bucket histogram with the same hash.
    val occ = rows.flatMap { case (id, text, t) =>
      bigrams(text).map(g => (id, h28(g) % Buckets, t))
    }
    val expWeights = occ
      .groupBy(_._2)
      .map { case (b, g) =>
        val nRaw = g.size.toLong
        val nT = g.count(_._3).toLong
        b -> (nRaw, nT, (nT + 1) * 1000000L / (nRaw + 1))
      }
    val gotWeights = weights
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotWeights == expWeights)

    val expScores = occ
      .groupBy(_._1)
      .map { case (id, g) =>
        val s = g.map(o => expWeights(o._2)._3).sum
        id -> ((g.size.toLong, s, s / g.size))
      }
    val gotScores = scores
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotScores == expScores)
    assert(!gotScores.contains(5L) && !gotScores.contains(6L),
      "docs with no bigram carry no evidence and emit no row")
  }

  test("target-pure documents outscore target-free documents on average") {
    // Targets speak one vocabulary, the raw rest another: every
    // target bigram bucket gets ratio ~1, every non-target bucket
    // ~1/(n+1) — the target-like probe must land on top.
    val targets = (0L until 5L).map(i => (i, "alpha beta gamma delta alpha beta", true))
    val rest = (10L until 30L).map(i => (i, "omega psi chi phi omega psi chi", false))
    val probeLike = (100L, "alpha beta gamma delta", false)
    val probeUnlike = (101L, "omega psi chi phi", false)
    val raw = corpus(targets ++ rest ++ Seq(probeLike, probeUnlike): _*)
    val weights = Importance.ngramImportanceWeights(raw, "text", "is_target", 4096)
    val scores = Importance
      .importanceScores(raw, "doc_id", "text", weights, 4096)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .toMap
    assert(scores(100L) > scores(101L),
      s"target-like probe must outscore the unlike one: $scores")
  }

  test("selectByImportance: deterministic top-k, ties to the smaller id, k rows") {
    val scored = Seq(
      (1L, 4L, 400L, 100L),
      (2L, 4L, 400L, 100L),
      (3L, 4L, 800L, 200L),
      (4L, 4L, 400L, 100L),
      (5L, 4L, 40L, 10L)
    ).toDF("doc_id", "n_bigrams", "score_micro", "avg_micro")
    val kept = Importance
      .selectByImportance(scored, "doc_id", 3)
      .collect()
      .map(_.getLong(0))
    assert(kept.toSeq == Seq(3L, 1L, 2L), s"got ${kept.toSeq}")
  }

  test("two-corpus weights equal the flag form bit-for-bit when target ⊆ raw") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", true),
      (2L, "the quick brown fox sat still", false),
      (3L, "pack my box with five dozen liquor jugs", true),
      (4L, "over the lazy dog the quick fox", false)
    )
    val raw = corpus(rows: _*)
    val target = corpus(rows.filter(_._3): _*)
    val flag = Importance
      .ngramImportanceWeights(raw, "text", "is_target", Buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val two = Importance
      .ngramImportanceWeightsFrom(raw, target, "text", Buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(flag == two)
  }

  test("dsir_weights/dsir_score CLI verbs: frozen sidecar resolves buckets; mismatch refused") {
    val root = java.nio.file.Files.createTempDirectory("graft-dsir-cli").toString
    val rows = (0L until 40L).map { i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 25}").mkString(" "), i % 5 == 0)
    }
    corpus(rows: _*).write.parquet(s"$root/raw")
    corpus(rows.filter(_._3): _*).write.parquet(s"$root/target")
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "dsir_weights", "--data", s"$root/raw",
      "--target", s"$root/target", "--out", s"$root/w", "--buckets", "128"), spark)
    // score WITHOUT --buckets: must resolve 128 from the sidecar
    graft.pipeline.PipelineRunner.run(Array(
      "--maintenance", "dsir_score", "--data", s"$root/raw",
      "--weights", s"$root/w", "--out", s"$root/scored", "--k", "10"), spark)
    val lib = Importance.selectByImportance(
      Importance.importanceScores(
        spark.read.parquet(s"$root/raw"), "doc_id", "text",
        spark.read.parquet(s"$root/w"), 128),
      "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val got = spark.read.parquet(s"$root/scored")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"), r.getAs[Long]("avg_micro"))).toSet
    assert(got == lib, "CLI score must equal the library against the frozen weights")
    // a disagreeing explicit bucket count must fail LOUDLY
    val e = intercept[IllegalArgumentException](
      graft.pipeline.PipelineRunner.run(Array(
        "--maintenance", "dsir_score", "--data", s"$root/raw",
        "--weights", s"$root/w", "--out", s"$root/never", "--buckets", "64"), spark))
    assert(e.getMessage.contains("mis-bucket"), e.getMessage)
    // and re-freezing into the same dir with a different count too
    val e2 = intercept[IllegalArgumentException](
      Importance.recordBuckets(spark, s"$root/w", 64))
    assert(e2.getMessage.contains("frozen"), e2.getMessage)
  }

  test("buckets must be positive") {
    val e = intercept[IllegalArgumentException](
      Importance.ngramImportanceWeights(corpus((1L, "a b", true)), "text", "is_target", 0))
    assert(e.getMessage.contains("buckets"))
  }
}
