package graft

import graft.operators.QualityModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Frozen-LM quality model: the self-model equivalence that anchors it
  * to the oracle-checked q106 rule, the OOV penalty, and build-crash
  * recovery.
  */
class QualityModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-qm-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("gate against a model frozen from the same corpus equals q106 exactly") {
    val root = Files.createTempDirectory("graft-qm-self").toString
    val model = s"$root/lm"
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    QualityModel.build(spark, docs, "doc_id", "text", model)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "surprisal_bits", "n_bigrams", "keep_doc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val frozen = rows(QualityModel.gate(spark, docs, "doc_id", "text", model))
    val q106 = rows(graft.queries.TextQueries.q106LmSurprisal(spark, sf))
    assert(frozen == q106, "self-model gate must reproduce the corpus-relative rule bit for bit")
  }

  test("OOV bigrams score the penalty; pure-OOV text is rejected, in-model text keeps") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-qm-oov").toString
    val model = s"$root/lm"
    // Reference: one highly regular corpus — every bigram seen often.
    val ref = (1 to 20).map(i => (i.toLong, "a b a b a b a b")).toDF("doc_id", "text")
    QualityModel.build(spark, ref, "doc_id", "text", model)
    val batch = Seq(
      (100L, "a b a b a b"), // all in-model, low surprisal
      (101L, "z9 z8 z7 z6 z5") // every bigram OOV
    ).toDF("doc_id", "text")
    val out = QualityModel
      .gate(spark, batch, "doc_id", "text", model)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toMap
    val (oovBits, oovN, oovKeep) = out(101L)
    assert(oovBits == 22L * oovN && !oovKeep, s"OOV scores 22 bits each and rejects: $oovBits/$oovN")
    assert(out(100L)._3, "in-model regular text keeps")
    // Docs with < 2 tokens have no bigrams and are absent (q106's contract).
    val short = QualityModel
      .gate(spark, Seq((200L, "solo")).toDF("doc_id", "text"), "doc_id", "text", model)
      .count()
    assert(short == 0L, "sub-bigram docs are absent from the gate output")
  }

  test("an empty or sub-bigram reference corpus builds a servable all-OOV model") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-qm-empty").toString
    val model = s"$root/lm"
    // Reference with no bigrams at all: every doc below two tokens.
    val ref = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    QualityModel.build(spark, ref, "doc_id", "text", model)
    val out = QualityModel
      .gate(spark, Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(out.length == 1, "empty model still scores")
    assert(out(0).getLong(1) == 44L && !out(0).getBoolean(4), "all bigrams OOV, rejected")
  }

  test("versioned model: crashed build invisible, rebuild flips pointer, prior version retained") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-qm-crash").toString
    val model = s"$root/lm"
    val ref = Seq((1L, "x y x y")).toDF("doc_id", "text")
    QualityModel.build(spark, ref, "doc_id", "text", model)
    // Crashed retrain: a half-written v2 exists, pointer still at v1 —
    // readers must keep serving v1 and never touch the layout.
    assert(new java.io.File(s"$model/v1").exists() && new java.io.File(s"$model/_current").exists())
    assert(new java.io.File(s"$model/v2").mkdirs(), "fabricate the orphan version")
    val out = QualityModel
      .gate(spark, Seq((2L, "x y")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(out.length == 1 && out(0).getBoolean(4), "gate serves the pointed version")
    assert(new java.io.File(s"$model/v2").exists(), "reader never mutates the model dir")
    // The next build overwrites the orphan and flips the pointer; the
    // previous version survives for readers that resolved it mid-batch.
    QualityModel.build(spark, Seq((1L, "p q p q")).toDF("doc_id", "text"), "doc_id", "text", model)
    val out2 = QualityModel
      .gate(spark, Seq((3L, "p q")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(out2.length == 1 && out2(0).getBoolean(4), "rebuilt model serves the new vocabulary")
    assert(new java.io.File(s"$model/v1").exists(), "predecessor retained through the flip")
    // A third build prunes v1 (older than the retained predecessor).
    QualityModel.build(spark, Seq((1L, "r s r s")).toDF("doc_id", "text"), "doc_id", "text", model)
    assert(!new java.io.File(s"$model/v1").exists(), "older versions pruned")
    assert(new java.io.File(s"$model/v2").exists(), "immediate predecessor retained")
  }

  test("retain=N keeps N predecessors for gate batches that outlive multiple retrains") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-qm-retain").toString
    val model = s"$root/lm"
    val ref = Seq((1L, "x y x y")).toDF("doc_id", "text")
    (1 to 4).foreach(_ => QualityModel.build(spark, ref, "doc_id", "text", model, retain = 2))
    assert(!new java.io.File(s"$model/v1").exists(), "versions beyond the window pruned")
    assert(
      new java.io.File(s"$model/v2").exists() && new java.io.File(s"$model/v3").exists(),
      "retain=2 keeps both predecessors of v4"
    )
    assert(new java.io.File(s"$model/v4").exists())
  }

  test("a legacy swap-layout model keeps its serving dirs through one flip, pruned on the next") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-qm-legacy").toString
    val model = s"$root/lm"
    // Fabricate the legacy layout: bare pair/ + uni/ at the root, no
    // pointer — what the pre-versioning build wrote.
    Seq(("a", "b", 4L)).toDF("w1", "w2", "c12").write.parquet(s"$model/pair")
    Seq(("a", 4L)).toDF("w1", "c1").write.parquet(s"$model/uni")
    val legacy = QualityModel
      .gate(spark, Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(legacy.length == 1 && legacy(0).getBoolean(4), "legacy layout served as-is")
    // First versioned build: a concurrent legacy-layout reader mid-batch
    // must keep its serving dirs — same one-flip retention as v<n-1>.
    QualityModel.build(spark, Seq((1L, "p q p q")).toDF("doc_id", "text"), "doc_id", "text", model)
    assert(
      new java.io.File(s"$model/pair").exists() && new java.io.File(s"$model/uni").exists(),
      "legacy dirs retained through the superseding flip"
    )
    // The next build prunes them (their retention window has passed).
    QualityModel.build(spark, Seq((1L, "p q p q")).toDF("doc_id", "text"), "doc_id", "text", model)
    assert(
      !new java.io.File(s"$model/pair").exists() && !new java.io.File(s"$model/uni").exists(),
      "legacy dirs pruned after their retention flip"
    )
    val out = QualityModel
      .gate(spark, Seq((9L, "p q")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(out.length == 1 && out(0).getBoolean(4), "versioned model serves after legacy pruning")
  }
}
