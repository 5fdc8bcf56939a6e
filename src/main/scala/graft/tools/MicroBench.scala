package graft.tools

import org.apache.spark.sql.functions._

/** Microbenchmark: native codegen expressions vs the interpreted
  * higher-order-function forms they replace.
  * Usage: runMain graft.tools.MicroBench [sfDir]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-microbench")
    graft.functions.GraftFunctions.register(spark)

    val e = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .crossJoin(spark.range(0, 50).toDF("rep"))
      .persist()
    e.count()

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $label%-28s $s%8.3f s")
      s
    }

    val hofDot = aggregate(
      zip_with(col("emb"), col("emb"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v
    )
    val a = time("dot: HOF fold")(
      e.select(sum(hofDot)).collect()
    )
    val b = time("dot: graft_dot native")(
      e.select(sum(graft.functions.GraftFunctions.graft_dot(col("emb"), col("emb")))).collect()
    )

    val ints = e.withColumn("xs", transform(col("emb"), v => (abs(v) * 1e6).cast("long") % 268435456))
      .persist()
    ints.count()
    val p = lit(2147483647L)
    val hofMinhash = transform(
      sequence(lit(0), lit(15)),
      i => array_min(transform(col("xs"), x => ((i * 2 + 3) * x + i * 97 + 11) % p))
    )
    val c = time("minhash: HOF nested")(
      ints.select(sum(element_at(hofMinhash, 1))).collect()
    )
    val d = time("minhash: graft_minhash")(
      ints
        .select(sum(element_at(graft.functions.GraftFunctions.graft_minhash(col("xs"), 16), 1)))
        .collect()
    )

    def bitAt(h: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(h / pow(lit(2.0), b)).cast("long") % 2
    val hofSimhash = aggregate(
      zip_with(
        transform(
          sequence(lit(0), lit(27)),
          bb =>
            when(
              aggregate(
                col("xs"),
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
    val g = time("simhash: HOF nested")(
      ints.select(sum(hofSimhash)).collect()
    )
    val h = time("simhash: graft_simhash")(
      ints.select(sum(graft.functions.GraftFunctions.graft_simhash(col("xs"), 28))).collect()
    )
    val hofL2 = aggregate(
      zip_with(col("emb"), col("emb2"), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v
    )
    val e2 = e.withColumn("emb2", reverse(col("emb")))
    val i2 = time("l2: HOF fold")(
      e2.select(sum(hofL2)).collect()
    )
    val j2 = time("l2: graft_l2 native")(
      e2.select(sum(graft.functions.GraftFunctions.graft_l2(col("emb"), col("emb2")))).collect()
    )
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .crossJoin(spark.range(0, 20).toDF("rep"))
      .persist()
    docs.count()
    val k1 = time("shingles: HOF chain")(
      graft.queries.TextQueries
        .withShinglesHof(docs)
        .select(sum(size(col("sh_ints"))))
        .collect()
    )
    val k2 = time("shingles: graft_shingles")(
      graft.queries.TextQueries
        .withShingles(docs)
        .select(sum(size(col("sh_ints"))))
        .collect()
    )
    println(
      f"[micro] speedup dot=${a / b}%.1fx minhash=${c / d}%.1fx simhash=${g / h}%.1fx l2=${i2 / j2}%.1fx shingles=${k1 / k2}%.1fx"
    )

    // Quantiles at UNBOUNDED value cardinality (every row distinct):
    // the regime where the exact histogram trick degrades to a
    // full sort and a mergeable sketch is the only O(state) plan.
    val vals = spark
      .range(0, 20000000)
      .select(
        (col("id") % 8).cast("string").as("g"),
        (sin(col("id").cast("double")) * 1e9).as("v")
      )
      .persist()
    vals.count()
    val s1 = time("quantile: exact sort")(
      vals
        .withColumn(
          "rn",
          row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("g")).orderBy(col("v"))
          )
        )
        .withColumn(
          "cnt",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("g")))
        )
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("g"), col("v"))
        .collect()
    )
    val s2 = time("quantile: approx_percentile")(
      vals.groupBy(col("g")).agg(percentile_approx(col("v"), lit(0.5), lit(10000))).collect()
    )
    val s3 = time("quantile: graft_tdigest")(
      vals
        .groupBy(col("g"))
        .agg(graft.functions.GraftFunctions.graft_tdigest(col("v"), Seq(0.5)))
        .collect()
    )
    println(f"[micro] quantile speedup vs sort: approx=${s1 / s2}%.1fx tdigest=${s1 / s3}%.1fx")
    spark.stop()
  }
}
