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

  test("an empty train pool is refused loudly (both variants)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ev = eval.toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      FewShot.assemble(empty, ev, "doc_id", "text", 3, "s"))
    assert(e1.getMessage.contains("EMPTY"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      FewShot.assembleDistinct(empty, ev, "doc_id", "text", 3, "s"))
    assert(e2.getMessage.contains("EMPTY"), e2.getMessage)
  }

  test("assembleDistinct: k > |train| is refused by pigeonhole") {
    val tr = (0L until 2L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      FewShot.assembleDistinct(tr, eval.toDF("doc_id", "text"), "doc_id", "text", 3, "s"))
    assert(e.getMessage.contains("pigeonhole"), e.getMessage)
  }

  test("assembleDistinct: k distinct shots whenever k <= |train|, even at pool exhaustion") {
    // pool of exactly k: every eval item must receive ALL k shots
    // (the independent-slots form collides with probability
    // 1 - k!/k^k — certain to repeat somewhere over 20 items)
    val tr = (0L until 4L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val ev = (100L until 120L).map(i => (i, s"e$i")).toDF("doc_id", "text")
    val rows = FewShot.assembleDistinct(tr, ev, "doc_id", "text", 4, "zz")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(rows.length == 20)
    rows.foreach { case (eid, shots) =>
      assert(shots.toSet == Set(0L, 1L, 2L, 3L), s"eval $eid must draw the whole pool, got $shots")
    }
    // and the independent-slots form demonstrably collides on this fixture
    val indep = FewShot.assemble(tr, ev, "doc_id", "text", 4, "zz")
      .collect().map(_.getSeq[Long](1))
    assert(indep.exists(s => s.distinct.length < s.length),
      "fixture must make independent slots collide, or this test proves nothing")
  }

  test("assembleDistinct: driver replay of the linear probe; non-colliding slots match assemble") {
    val trSeq = (0L until 7L).map(i => (i * 3, s"t$i")) // ids 0,3,..,18
    val tr = trSeq.toDF("doc_id", "text")
    val ev = (100L until 110L).map(i => (i, s"e$i")).toDF("doc_id", "text")
    val k = 5
    val got = FewShot.assembleDistinct(tr, ev, "doc_id", "text", k, "pr")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getString(2)))).toMap
    val pool = trSeq.sortBy(_._1)
    val n = pool.length
    (100L until 110L).foreach { eid =>
      var taken = List.empty[Long]
      val shots = (0 until k).map { slot =>
        val base = h28(s"pr_${eid}_$slot") % n
        val rank = (0 until k).map(p => (base + p) % n).find(c => !taken.contains(c)).get
        taken = taken :+ rank
        pool(rank.toInt)
      }
      assert(got(eid)._1 == shots.map(_._1), s"eval $eid shot ids")
      assert(got(eid)._2 == shots.map(_._2).mkString(" ") + s" e$eid", s"eval $eid prompt")
    }
  }

  test("assembleDistinct: a seed carrying quotes/backslashes hashes exactly as assemble's") {
    // The probe expressions are built with the Column API, never
    // string-interpolated SQL — a seed that would break (or silently
    // re-parse under) a SQL parser must still match [[assemble]]'s
    // lit(seed) hash on non-colliding slots, and match the driver
    // replay. Large pool + k=2 ⇒ collisions are absent here, so the
    // two variants must agree row for row.
    val seed = """o'br\ie"n--;"""
    val tr = (0L until 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val evSeq = (1000L until 1010L).map(i => (i, s"e$i"))
    val ev = evSeq.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2))).toSet
    val dis = rows(FewShot.assembleDistinct(tr, ev, "doc_id", "text", 2, seed))
    assert(dis == rows(FewShot.assemble(tr, ev, "doc_id", "text", 2, seed)))
    // and the driver md5 replay agrees on the raw-bytes seed
    val byId = dis.map(t => t._1 -> t._2).toMap
    evSeq.foreach { case (eid, _) =>
      val want = (0 until 2).map(slot => h28(s"${seed}_${eid}_$slot") % 400)
      assert(byId(eid) == want, s"eval $eid")
    }
  }

  test("assembleDistinct at k=1 equals assemble (no collision possible)") {
    val tr = train.toDF("doc_id", "text"); val ev = eval.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2))).toSet
    assert(rows(FewShot.assembleDistinct(tr, ev, "doc_id", "text", 1, "k1"))
      == rows(FewShot.assemble(tr, ev, "doc_id", "text", 1, "k1")))
  }

  test("k must be positive") {
    val e = intercept[IllegalArgumentException](
      FewShot.assemble(train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
        "doc_id", "text", 0, "s"))
    assert(e.getMessage.contains("k must be positive"))
  }
}
