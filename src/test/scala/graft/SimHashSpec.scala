package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-simhash-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("graft_simhash equals the interpreted HOF vote chain exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      Seq(1L, 2L, 3L, 268435455L),          // boundary 28-bit value
      Seq(0L),                              // all-zero hash: all votes -1
      Seq(123456L, 123456L, 123456L),       // repeated token dominates
      Seq.empty[Long]                       // empty doc: simhash 0
    ).toDF("th")
    def bitAt(h: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(h / pow(lit(2.0), b)).cast("long") % 2
    val hof = aggregate(
      zip_with(
        transform(
          sequence(lit(0), lit(27)),
          bb =>
            when(
              aggregate(
                col("th"),
                lit(0L),
                (acc, h) => acc + when(bitAt(h, bb) === 1, lit(1L)).otherwise(lit(-1L))
              ) > 0,
              lit(1L)
            ).otherwise(lit(0L))
        ),
        sequence(lit(0), lit(27)),
        (bit, i) => bit * pow(lit(2.0), i).cast("long")
      ),
      lit(0L),
      (acc, v) => acc + v
    )
    val out = df
      .withColumn("native", GraftFunctions.graft_simhash(col("th"), 28))
      .withColumn("hof", hof)
      .collect()
    out.foreach(r => assert(r.getAs[Long]("native") == r.getAs[Long]("hof"), r.toString))
  }

  test("all three native functions resolve through the session registry") {
    GraftFunctions.register(spark)
    val row = spark
      .sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |       graft_minhash(array(5L, 9L), 2) AS m,
          |       graft_simhash(array(5L, 9L), 28) AS s""".stripMargin
      )
      .collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getSeq[Long](1).length == 2)
    assert(row.getLong(2) >= 0L)
  }

  test("extensions installer wires without error (cluster deploy path)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // all three injectFunction calls
  }
}
