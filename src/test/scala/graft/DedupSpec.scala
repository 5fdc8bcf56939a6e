package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The df-cap knob on the near-dup candidate generator: a cap at or
  * above the maximum shingle document frequency must be lossless, and
  * any tighter cap may only REMOVE pairs (bounded-recall contract —
  * never invents candidates).
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-dedup-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("df-cap >= max document frequency is lossless") {
    val uncapped = pairSet(queries.TextQueries.nearDupPairs(spark, sf))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val capped = pairSet(queries.TextQueries.nearDupPairs(spark, sf, dfCap = Some(nDocs)))
    assert(capped == uncapped, "cap above any possible df must not change the result")
    assert(uncapped.nonEmpty, "fixture should produce near-dup pairs")
  }

  test("tight df-cap only removes pairs, never invents them") {
    val uncapped = pairSet(queries.TextQueries.nearDupPairs(spark, sf))
    val capped = pairSet(queries.TextQueries.nearDupPairs(spark, sf, dfCap = Some(2L)))
    assert(capped.subsetOf(uncapped), s"invented pairs: ${capped -- uncapped}")
  }

  test("threshold parameter tightens the pair set monotonically") {
    val loose = pairSet(queries.TextQueries.nearDupPairs(spark, sf, threshold = 0.3))
    val strict = pairSet(queries.TextQueries.nearDupPairs(spark, sf, threshold = 0.7))
    assert(strict.subsetOf(loose))
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id", "comp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ccBoth(pairs: Seq[(Long, Long)]): (Set[(Long, Long)], Set[(Long, Long)]) = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    (labels(operators.Dedup.connectedComponents(df)),
      labels(operators.Dedup.connectedComponentsStar(df)))
  }

  test("star CC equals label propagation on the real near-dup graph") {
    val pairs = queries.TextQueries.nearDupPairs(spark, sf)
    val prop = labels(operators.Dedup.connectedComponents(pairs))
    val star = labels(operators.Dedup.connectedComponentsStar(pairs))
    assert(prop.nonEmpty && star == prop)
  }

  test("star CC handles a deep chain (diameter >> log² n)") {
    val chain = (1L until 60L).map(i => (i, i + 1))
    val (prop, star) = ccBoth(chain)
    assert(star == prop)
    assert(star == (1L to 60L).map(i => (i, 1L)).toSet, "one component labeled by its minimum")
  }

  test("star CC equals label propagation on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val n = 80
      val edges = (0 until 120).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val (prop, star) = ccBoth(edges)
      assert(star == prop, "star and propagation labels must agree")
    }
  }
}
