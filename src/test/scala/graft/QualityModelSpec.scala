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

  test("a crash between the build's swap renames recovers on next use; rebuild replaces") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-qm-crash").toString
    val model = s"$root/lm"
    val ref = Seq((1L, "x y x y")).toDF("doc_id", "text")
    QualityModel.build(spark, ref, "doc_id", "text", model)
    // Crash window: model renamed aside, new model not yet in place.
    val fs = new org.apache.hadoop.fs.Path(model)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(
      fs.rename(
        new org.apache.hadoop.fs.Path(model),
        new org.apache.hadoop.fs.Path(s"$model.__build_old")
      )
    )
    val out = QualityModel
      .gate(spark, Seq((2L, "x y")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(out.length == 1, "gate recovers the stranded model on entry")
    // A rebuild atomically replaces the recovered model.
    QualityModel.build(spark, Seq((1L, "p q p q")).toDF("doc_id", "text"), "doc_id", "text", model)
    val out2 = QualityModel
      .gate(spark, Seq((3L, "p q")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    assert(out2.length == 1 && out2(0).getBoolean(4), "rebuilt model serves the new vocabulary")
  }
}
