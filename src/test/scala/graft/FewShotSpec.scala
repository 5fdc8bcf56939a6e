package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FewShot

/** Few-shot prompt assembly: a full driver-side md5 replay of the
  * shot choice and render, the leakage-safety and reproducibility
  * guarantees, and the k guard.
  */
class FewShotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-fewshot-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import spark.implicits._

  private def h28(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  private val train = (0L until 17L).map(i => (i * 2 + 1, s"shot text $i")) // odd ids
  private val eval = (0L until 5L).map(i => (i * 100 + 50, s"query $i"))

  test("full driver replay: shot ids, slot order, and the rendered prompt") {
    val got = FewShot
      .assemble(train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, seed = "sd")
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getString(2))))
      .toMap
    val pool = train.sortBy(_._1) // dense rank = ascending doc_id order
    eval.foreach { case (eid, q) =>
      val shots = (0 until 3).map { slot =>
        pool((h28(s"sd_${eid}_$slot") % pool.length).toInt)
      }
      val expPrompt = shots.map(_._2).mkString(" ") + " " + q
      assert(got(eid)._1 == shots.map(_._1), s"eval $eid shot ids")
      assert(got(eid)._2 == expPrompt, s"eval $eid prompt")
    }
  }

  test("leakage-safe by construction: no eval id ever appears as a shot") {
    // make train/eval pools large enough that a leak would be likely
    // if the eval table could enter the join
    val tr = (0L until 40L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val ev = (100L until 140L).map(i => (i, s"e$i")).toDF("doc_id", "text")
    val shotIds = FewShot
      .assemble(tr, ev, "doc_id", "text", k = 5, seed = "x")
      .select(org.apache.spark.sql.functions.explode($"shot_ids"))
      .collect().map(_.getLong(0)).toSet
    assert(shotIds.forall(_ < 40L), "every shot must come from the train pool")
  }

  test("reproducible: same seed identical, different seed re-rolls") {
    val tr = train.toDF("doc_id", "text"); val ev = eval.toDF("doc_id", "text")
    def run(seed: String) = FewShot.assemble(tr, ev, "doc_id", "text", 3, seed)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(run("a") == run("a"))
    assert(run("a") != run("b"))
  }

  test("k must be positive") {
    val e = intercept[IllegalArgumentException](
      FewShot.assemble(train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
        "doc_id", "text", 0, "s"))
    assert(e.getMessage.contains("k must be positive"))
  }
}
