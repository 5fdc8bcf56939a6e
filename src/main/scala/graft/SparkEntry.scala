package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a §7
  * extension) expressed over the driver testdata; `oracleSql` carries the
  * equivalent DuckDB SQL. Column names and output types are aligned
  * between the two on purpose — see [[graft.queries.CoreQueries]] for
  * the determinism rules (integer-cents money sums, exact double rules,
  * calendar-function dialect mapping).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q12StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (CoreQueries.q1PricingSummary _),
    "q2_filter_project" -> (CoreQueries.q2FilterProject _),
    "q3_users_latest" -> (CoreQueries.q3UsersLatest _),
    "q4_time_dims" -> (CoreQueries.q4TimeDims _),
    "q5_distinct" -> (CoreQueries.q5Distinct _),
    "q6_join_full_using" -> (CoreQueries.q6JoinFullUsing _),
    "q7_join_left_multi" -> (CoreQueries.q7JoinLeftMulti _),
    "q8_join_left_using" -> (CoreQueries.q8JoinLeftUsing _),
    "q9_topk" -> (CoreQueries.q9TopK _),
    "q10_window_rank" -> (CoreQueries.q10WindowRank _),
    "q11_sessionize" -> (CoreQueries.q11Sessionize _),
    "q12_star_join" -> (CoreQueries.q12StarJoin _),
    "q13_setops" -> (CoreQueries.q13SetOps _),
    "q14_rollup" -> (CoreQueries.q14Rollup _),
    "q15_json_extract" -> (CoreQueries.q15JsonExtract _),
    "q16_agg_stats" -> (CoreQueries.q16AggStats _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      "SELECT event_id, user_id, value, props FROM events WHERE event_type = 'click'",
    "q3_users_latest" ->
      """SELECT user_id, ts AS last_ts, event_type AS last_event_type, value AS last_value
        |FROM (SELECT *, max(ts) OVER (PARTITION BY user_id) AS max_ts FROM events)
        |WHERE ts = max_ts AND user_id IS NOT NULL""".stripMargin,
    "q4_time_dims" ->
      """SELECT start_time,
        |  CAST(hour(start_time) AS INTEGER) AS hour,
        |  CAST(day(start_time) AS INTEGER) AS day,
        |  CAST(weekofyear(start_time) AS INTEGER) AS week,
        |  CAST(month(start_time) AS INTEGER) AS month,
        |  CAST(year(start_time) AS INTEGER) AS year,
        |  CAST(dayofweek(start_time) + 1 AS INTEGER) AS weekday
        |FROM (SELECT DISTINCT date_trunc('second', ts) AS start_time FROM events)""".stripMargin,
    "q5_distinct" ->
      "SELECT DISTINCT c_mktsegment AS mktsegment, c_nationkey AS nationkey FROM customer",
    "q6_join_full_using" ->
      """SELECT custkey, o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM (SELECT o_custkey AS custkey, o_orderkey, o_totalprice FROM orders) o
        |FULL JOIN (SELECT c_custkey AS custkey, c_name, c_mktsegment FROM customer) c
        |USING (custkey)""".stripMargin,
    "q7_join_left_multi" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity, d.max_qty
        |FROM lineitem l
        |LEFT JOIN (SELECT l_partkey AS pk, max(l_quantity) AS max_qty FROM lineitem GROUP BY 1) d
        |ON l.l_partkey = d.pk AND l.l_quantity = d.max_qty""".stripMargin,
    "q8_join_left_using" ->
      """SELECT orderkey, l_linenumber, l_extendedprice, o_orderdate, o_orderpriority
        |FROM (SELECT l_orderkey AS orderkey, l_linenumber, l_extendedprice FROM lineitem) l
        |LEFT JOIN (SELECT o_orderkey AS orderkey, o_orderdate, o_orderpriority FROM orders) o
        |USING (orderkey)""".stripMargin,
    "q9_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q11_sessionize" ->
      """SELECT event_id, user_id, CAST(session_seq AS BIGINT) AS session_seq FROM (
        |  SELECT event_id, user_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |             OR es - lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM (SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)))""".stripMargin,
    "q12_star_join" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q13_setops" ->
      """SELECT nationkey, 'both' AS side FROM
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS side FROM
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)""".stripMargin,
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q15_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q16_agg_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY event_type""".stripMargin
  )
}
