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
}
