package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The defining property of a Lloyd re-assignment step: with the
  * iteration-1 centroids fixed, every vector's distance to its
  * iteration-2 centroid is ≤ its distance to its iteration-1 centroid
  * (pointwise — this holds exactly even with quantized centroid means,
  * because assignment 2 is an argmin over exactly those centroids).
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-kmeans-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("re-assignment never increases a vector's distance to its centroid") {
    val out = queries.VectorQueries
      .q58KMeans(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val vecs = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    // Rebuild the iteration-1 centroids exactly as the query does:
    // integer-scaled exact means over the iteration-1 clusters.
    val scale = 1048576L
    val c1: Map[Long, Array[Double]] = out
      .groupBy(_._2)
      .map { case (cl, rows) =>
        val members = rows.map(r => vecs(r._1))
        val dims = members.head.length
        cl -> Array.tabulate(dims) { d =>
          members.map(m => math.floor(m(d) * scale).toLong).sum.toDouble / (members.length * scale.toDouble)
        }
      }
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var moved = 0
    out.foreach { case (id, cl1, cl2) =>
      if (cl1 != cl2) moved += 1
      // cl2's centroid may have no members from iteration 1 only if the
      // cluster existed in c1 — assignment 2 is over c1's keys, so lookup
      // always succeeds.
      assert(
        sq(vecs(id), c1(cl2)) <= sq(vecs(id), c1(cl1)) + 1e-12,
        s"vec $id: re-assignment increased distance"
      )
    }
    assert(out.map(_._2).distinct.length > 1, "iteration 1 must produce multiple clusters")
  }
}
