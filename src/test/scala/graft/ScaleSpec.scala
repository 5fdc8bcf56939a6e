package graft

import graft.operators.Scale
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Scale-technique specs: bucketed joins eliminate the shuffle; salted
  * joins preserve plain-join results.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-scale-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("pageRank at 2 fixed rounds reproduces q84; with tol it converges and conserves mass") {
    import org.apache.spark.sql.functions._
    val pairs = queries.TextQueries.q21NgramJaccard(spark, sf).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // Consistency with the oracle-checked fixed-iteration query.
    val (r2, rounds2, _) = Scale.pageRank(edges, maxIters = 2, tol = 0.0)
    assert(rounds2 == 2)
    val want = queries.TextQueries
      .q84PageRank(spark, sf)
      .select(col("doc_id").as("src"), col("rank_iter2").as("want"))
    val mismatches = r2
      .join(want, Seq("src"), "full_outer")
      .filter(col("r").isNull || col("want").isNull || col("r") =!= col("want"))
      .count()
    assert(mismatches == 0, "2-round library ranks must equal q84's rank_iter2 exactly")
    // Convergence: bounded rounds, converged flag, and the Σr = n fixed
    // point (damping mass balance) within the integer-scaling slack.
    val (rc, rounds, converged) = Scale.pageRank(edges, maxIters = 50, tol = 1e-7)
    assert(converged && rounds < 50, s"expected convergence before 50 rounds, ran $rounds")
    val row = rc.agg(count(lit(1)).cast("double"), sum(col("r"))).collect()(0)
    val (n, mass) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(mass - n) < 1e-3 * n, s"rank mass must stay ~n: n=$n sum=$mass")
  }

  test("pageRank keeps src-only nodes at the base rank and rejects dst-only edge lists") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1 <-> 2 plus a directed 3 -> 1: nothing points back at 3. Before
    // the right-join onto the node set, 3 vanished from the rank table
    // after round one (groupBy(dst) rebuilt ranks from receivers only)
    // with no convergence-probe signal.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    // Deltas contract by ~damping per round, so 1e-4 needs ~60 rounds.
    val (r, _, converged) = Scale.pageRank(edges, maxIters = 100, tol = 1e-4)
    assert(converged)
    val ranks = r.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(ranks.keySet == Set(1L, 2L, 3L), s"src-only node must not vanish: $ranks")
    assert(math.abs(ranks(3L) - 0.15) < 1e-12, s"base rank expected for 3, got ${ranks(3L)}")
    // A dst that never appears as src has no out-degree: its incoming
    // mass would silently evaporate. That input is rejected up front.
    val bad = Seq((1L, 2L), (2L, 1L), (1L, 9L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException](Scale.pageRank(bad, 2, 0.0))
    assert(ex.getMessage.contains("undirected"), ex.getMessage)
  }

  test("bucketed co-located join plans without Exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    li.write
      .mode("overwrite")
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .option("path", s"$wh/li_b")
      .format("parquet")
      .saveAsTable("li_b")
    orders
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write
      .mode("overwrite")
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .option("path", s"$wh/ord_b")
      .format("parquet")
      .saveAsTable("ord_b")

    // At this fixture scale Catalyst correctly prefers a broadcast
    // join; disable it to expose the co-located sort-merge path that a
    // big-big join would take at 100 TB.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan"
      )
      assert(joined.count() == li.count(), "inner join on FK keeps every lineitem")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join result equals the plain join") {
    val li = spark.read
      .parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val orders = spark.read
      .parquet(s"$sf/orders.parquet")
      .select(
        org.apache.spark.sql.functions.col("o_orderkey").as("l_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice")
      )
    val plain = li.join(orders, Seq("l_orderkey"))
    val salted = Scale.saltedJoin(li, orders, "l_orderkey", 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("skewReport surfaces the hot key and a >1 skew ratio on skewed data") {
    import spark.implicits._
    val skewed = ((1 to 1000).map(_ => 7L) ++ (1L to 100L)).toDF("k")
    val rows = Scale.skewReport(skewed, "k", topK = 3).collect()
    assert(rows.head.getLong(0) == 7L, "hot key must rank first")
    assert(rows.head.getLong(1) == 1001L)
    assert(rows.head.getDouble(3) > 10.0, "skew ratio must flag the hot key")
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket") {
    val wh = Files.createTempDirectory("graft-bucket-prune").toString
    spark.read
      .parquet(s"$sf/orders.parquet")
      .write
      .mode("overwrite")
      .bucketBy(8, "o_custkey")
      .option("path", s"$wh/ord_p")
      .format("parquet")
      .saveAsTable("ord_p")
    val someKey = spark.read.parquet(s"$sf/orders.parquet").select("o_custkey").head().getLong(0)
    // autoBucketedScan downgrades bucketed reads for scan-only plans (no
    // exchange to eliminate) — turn it off so the filter goes through the
    // bucketed scan and its bucket pruning, which is the point here.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("ord_p").filter(org.apache.spark.sql.functions.col("o_custkey") === someKey)
      val plan = q.queryExecution.executedPlan.toString
      // Spark's scan reports bucket pruning as "SelectedBucketsCount: 1 out of 8".
      assert(
        plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning must reach the scan:\n$plan"
      )
      val expected = spark.read
        .parquet(s"$sf/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_custkey") === someKey)
        .count()
      assert(q.count() == expected)
    } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("nestedSampleTiers: tiers nest strictly, match the hash definition, and never churn") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 200000L
    val docs = spark.range(n).toDF("doc_id")
    val tiers = Scale
      .nestedSampleTiers(docs, "doc_id", seed = "t", maxTier = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    // Definition: tier == the deepest k with 10^k | md5-prefix hash.
    def hash(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"t_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    for (id <- 0L until 1000L) {
      val h = hash(id)
      val want = if (h % 1000 == 0) 3 else if (h % 100 == 0) 2 else if (h % 10 == 0) 1 else 0
      assert(tiers(id) == want, s"doc $id tier ${tiers(id)} != $want (h=$h)")
    }
    // Nesting + expected sizes: |tier>=k| ~ n/10^k (3-sigma bounds).
    val c1 = tiers.values.count(_ >= 1).toDouble
    val c2 = tiers.values.count(_ >= 2).toDouble
    val c3 = tiers.values.count(_ >= 3).toDouble
    assert(c1 > c2 && c2 > c3 && c3 > 0, "tiers must strictly nest with nonempty deepest")
    assert(math.abs(c1 - n / 10.0) < 3 * math.sqrt(n / 10.0), s"tier1 count $c1")
    assert(math.abs(c2 - n / 100.0) < 3 * math.sqrt(n / 100.0), s"tier2 count $c2")
    assert(math.abs(c3 - n / 1000.0) < 3 * math.sqrt(n / 1000.0), s"tier3 count $c3")
    // Growth stability: the same ids keep their tiers in a larger corpus.
    val grown = Scale
      .nestedSampleTiers(spark.range(2 * n).toDF("doc_id"), "doc_id", seed = "t", maxTier = 3)
      .filter(col("doc_id") < n)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(grown == tiers, "membership must be a pure function of the id")
  }
}
