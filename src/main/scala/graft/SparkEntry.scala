package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §7 and §2 (operator inventory).
  *
  * Every operator from the inventory registers here: `queries` gives the
  * Spark plan, `oracleSql` the ANSI-SQL equivalent the driver runs in DuckDB
  * over the same Parquet tables. Column names are aliased identically on
  * both sides (the driver sorts columns by name before hashing), and every
  * oracle query ends in a total ORDER BY so results are deterministic.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "s1_parquet_scan" -> (Relational.s1ParquetScan _),
    "p1_project_code" -> (Relational.p1ProjectCode _),
    "p2_json_field_extract" -> (Relational.p2JsonFieldExtract _),
    "p3_null_tolerant_select" -> (Relational.p3NullTolerantSelect _),
    "p4_status_filter" -> (Relational.p4StatusFilter _),
    "p5_validity_filter" -> (Relational.p5ValidityFilter _),
    "a1_count_rows" -> (Relational.a1CountRows _),
    "a2_ratings_distribution" -> (Relational.a2RatingsDistribution _),
    "a3_pagination_plan" -> (Relational.a3PaginationPlan _),
    "a4_throughput_stats" -> (Relational.a4ThroughputStats _),
    "a5_batch_rollup" -> (Relational.a5BatchRollup _),
    "a5b_rollup" -> (Relational.a5bRollup _),
    "a6_distinct_codes" -> (Relational.a6DistinctCodes _),
    "a6b_approx_distinct" -> (Relational.a6bApproxDistinct _),
    "o1_order_by_recency" -> (Relational.o1OrderByRecency _),
    "o2_limit" -> (Relational.o2Limit _),
    "o3_global_topk" -> (Relational.o3GlobalTopK _),
    "set1_union_cities" -> (Relational.set1UnionCities _),
    "set2_intersect" -> (Relational.set2Intersect _),
    "set3_except" -> (Relational.set3Except _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  SUM(l_quantity) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s1_parquet_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p1_project_code" ->
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey",
    "p2_json_field_extract" ->
      """SELECT event_id,
        |  COALESCE(json_extract_string(props, '$.k'), 'Unknown') AS k_str,
        |  COALESCE(json_extract_string(props, '$.missing'), 'Unknown') AS missing_str
        |FROM events ORDER BY event_id""".stripMargin,
    "p3_null_tolerant_select" ->
      """SELECT c_custkey, COALESCE(c_name, 'Unknown') AS name, n_big, big_total
        |FROM customer LEFT OUTER JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_big,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        |  FROM orders WHERE o_totalprice > 100000 GROUP BY o_custkey
        |) b ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "p4_status_filter" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'retry'
        |            WHEN event_type = 'signup' THEN 'parse'
        |            WHEN event_type = 'purchase' THEN 'parse'
        |            ELSE 'skip' END AS route, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY route""".stripMargin,
    "p5_validity_filter" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "a1_count_rows" ->
      "SELECT COUNT(*) AS n FROM lineitem",
    "a2_ratings_distribution" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  (COUNT(*) * 100) // (SELECT COUNT(*) FROM events) AS percentage,
        |  (SELECT COUNT(*) FROM events) AS total_count
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a3_pagination_plan" ->
      """SELECT COUNT(*) AS available,
        |  CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / 48.0) AS BIGINT) AS total_pages
        |FROM orders""".stripMargin,
    "a4_throughput_stats" ->
      """SELECT COUNT(*) AS n,
        |  CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS started_s,
        |  CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) AS completed_s,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) - CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS DOUBLE) AS rows_per_second
        |FROM events""".stripMargin,
    "a5_batch_rollup" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a5b_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a6_distinct_codes" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_distinct, COUNT(*) AS n_rows
        |FROM orders""".stripMargin,
    "o1_order_by_recency" ->
      """SELECT event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_s
        |FROM events ORDER BY ts_s DESC, event_id""".stripMargin,
    "o2_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 48""".stripMargin,
    "o3_global_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "set1_union_cities" ->
      """SELECT o_orderkey AS k, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey AS k, 'done' AS src FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin,
    "set2_intersect" ->
      """SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) <= 1997
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) >= 1998
        |ORDER BY o_custkey""".stripMargin,
    "set3_except" ->
      """SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) <= 1997
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) >= 1998
        |ORDER BY o_custkey""".stripMargin,
  )
}
