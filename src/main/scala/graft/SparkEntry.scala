package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in
  * [[oracleSql]] that DuckDB runs over the same parquet tables; column
  * names and types are aligned on both sides (aggregates go through
  * DECIMAL so results are exact and order-independent — see
  * [[graft.ops.RelationalQueries]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q3StarJoinRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational superset (SURVEY §2.3-§2.6)
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q2_filter_pushdown" -> (RelationalQueries.q2FilterPushdown _),
    "q3_star_join"       -> (RelationalQueries.q3StarJoinRevenue _),
    "q4_top_customers"   -> (RelationalQueries.q4TopCustomers _),
    "q5_window_rank"     -> (RelationalQueries.q5WindowRank _),
    "q6_distinct_agg"    -> (RelationalQueries.q6DistinctAgg _),
    "q7_union_all"       -> (RelationalQueries.q7UnionAll _),
    "q8_anti_join"       -> (RelationalQueries.q8AntiJoin _),
    "q9_rollup"          -> (RelationalQueries.q9Rollup _),
    "q10_semi_join"      -> (RelationalQueries.q10SemiJoin _),
    "q11_time_bucket"    -> (RelationalQueries.q11TimeBucket _),
    "q12_sessionize"     -> (RelationalQueries.q12Sessionize _),
    "q13_argmax"         -> (RelationalQueries.q13ArgMax _),
    "q14_asof_join"      -> (RelationalQueries.q14AsOfJoin _),
    // Reference-parity log surface (SURVEY §2.1-§2.6)
    "log_time_range"      -> (LogQueries.logTimeRange _),
    "log_filter_conj"     -> (LogQueries.logFilterConjunction _),
    "log_count"           -> (LogQueries.logCount _),
    "log_summary"         -> (LogQueries.logSummary _),
    "log_partition_slice" -> (LogQueries.logPartitionSlice _),
  )

  // DuckDB shared view of the reference's log shape, derived from events
  // exactly as LogQueries.logsView does.
  private val logsCte =
    """WITH logs AS (
      |  SELECT ts AS "timestamp", event_type AS level, props AS message,
      |         'c' || CAST(user_id % 4 AS VARCHAR) AS container,
      |         's' || CAST(user_id AS VARCHAR) AS session
      |  FROM events
      |)""".stripMargin

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_returnflag = 'R' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_star_join" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,
    "q4_top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q5_window_rank" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY part_rev DESC, p_partkey) AS rk
        |  FROM rev)
        |SELECT p_brand, p_partkey, part_rev, rk FROM ranked
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q6_distinct_agg" ->
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_value
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q7_union_all" ->
      """WITH u AS (
        |  SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT event_id, user_id, event_type, value FROM events
        |  WHERE event_type = 'purchase' AND value > 150)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q9_rollup" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q10_semi_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q11_time_bucket" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY date_trunc('day', ts), event_type
        |ORDER BY day, event_type""".stripMargin,
    "q12_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, value, ts,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |numbered AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged),
        |per_sess AS (
        |  SELECT user_id, sess_id, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sess_value
        |  FROM numbered GROUP BY user_id, sess_id)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
        |  CAST(SUM(CAST(sess_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q13_argmax" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        |  FROM events) t
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "q14_asof_join" ->
      """SELECT event_id, user_id, ts, value, last_error_ts FROM (
        |  SELECT event_id, user_id, ts, value, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_ts
        |  FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "log_time_range" ->
      s"""$logsCte
         |SELECT * FROM logs
         |WHERE "timestamp" >= TIMESTAMP '2024-01-08 00:00:00'
         |  AND "timestamp" <= TIMESTAMP '2024-01-15 23:59:59'
         |ORDER BY "timestamp", session, message""".stripMargin,
    "log_filter_conj" ->
      s"""$logsCte
         |SELECT * FROM logs
         |WHERE level = 'error' AND container <> 'c0'
         |  AND "timestamp" >= TIMESTAMP '2024-01-08 00:00:00'
         |ORDER BY "timestamp", session, message""".stripMargin,
    "log_count" ->
      s"""$logsCte
         |SELECT COUNT(*) AS n FROM logs
         |WHERE level = 'error'
         |  AND "timestamp" >= TIMESTAMP '2024-01-08 00:00:00'
         |  AND "timestamp" <= TIMESTAMP '2024-01-15 23:59:59'""".stripMargin,
    "log_summary" ->
      s"""$logsCte
         |SELECT container, COUNT(*) AS total_rows,
         |  COUNT(DISTINCT session) AS n_sessions,
         |  MIN("timestamp") AS min_ts, MAX("timestamp") AS max_ts
         |FROM logs GROUP BY container ORDER BY container""".stripMargin,
    "log_partition_slice" ->
      s"""$logsCte
         |SELECT "timestamp", level, message FROM logs
         |WHERE container = 'c1' AND session = 's5'
         |ORDER BY "timestamp", message""".stripMargin,
  )
}
