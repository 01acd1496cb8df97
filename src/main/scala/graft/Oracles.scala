package graft

/** DuckDB oracle SQL, one entry per key in SparkEntry.queries (SURVEY §2).
  *
  * Dialect/determinism policies (SURVEY §5.3 + §7.5):
  *  - every query ends with `ORDER BY ALL` (DuckDB sorts all columns asc,
  *    NULLS LAST by default — the Spark side mirrors with asc_nulls_last);
  *  - monetary sums go through DECIMAL(18,2) (exact, order-independent in
  *    both engines) — see graft.ops.dsum;
  *  - computed integers are cast to BIGINT (DuckDB's sum(BIGINT) is
  *    HUGEINT, ceil(double) is DOUBLE, length() is BIGINT — Spark's are
  *    long/long/int, so both sides are pinned to 64-bit);
  *  - timestamps are never emitted raw at sub-second precision from the
  *    ns-typed events table; epoch microseconds/seconds via epoch_us.
  */
object Oracles {
  /** Exact order-independent money sum (twin of graft.ops.dsum). */
  private def dsum(x: String): String =
    s"round(CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE), 2)"

  /** Decimal-factor product sums (twin of graft.ops.dmoney/dfrac/dsumExact):
    * factors are exact 2-dp decimals, multiplied in decimal, so the sum is
    * exact and identical in both engines. */
  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))"
  private val charge =
    s"$discPrice * CAST(1.0 + l_tax AS DECIMAL(4,2))"
  private def dsumExact(x: String): String =
    s"round(CAST(sum($x) AS DOUBLE), 2)"

  val sql: Map[String, String] = Map(
    // ---- §2.1 scans ----
    "q_scan_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY ALL""".stripMargin,
    "q_scan_count" ->
      Tables.schemas.keys.toSeq.sorted
        .map(n => s"SELECT '$n' AS table_name, count(*) AS n FROM $n")
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY ALL"),

    // ---- §2.2 filters ----
    "q_filter_pred" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_filter_in_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE (p_type LIKE 'PROMO%'
        |       OR p_brand IN ('Brand#1', 'Brand#5', 'Brand#10'))
        |  AND p_size <> 7 ORDER BY ALL""".stripMargin,
    "q_case_expr" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
         |            WHEN o_totalprice < 150000 THEN 'mid'
         |            ELSE 'high' END AS band,
         |       count(*) AS n, ${dsum("o_totalprice")} AS total
         |FROM orders GROUP BY 1 ORDER BY ALL""".stripMargin,

    // ---- §2.3 joins ----
    "q_join_inner" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY ALL""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY ALL""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY ALL""".stripMargin,
    "q_join_full" ->
      """SELECT ka, kb, price_a, price_b
        |FROM (SELECT o_orderkey AS ka, o_totalprice AS price_a FROM orders
        |      WHERE o_orderkey < 1000) a
        |FULL JOIN (SELECT o_orderkey AS kb, o_totalprice AS price_b FROM orders
        |           WHERE o_orderkey >= 500 AND o_orderkey < 1500) b
        |ON ka = kb ORDER BY ALL""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT')
        |ORDER BY ALL""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > 300000)
        |ORDER BY ALL""".stripMargin,
    "q_join_multiway" ->
      s"""SELECT c_mktsegment,
         |       ${dsumExact(discPrice)} AS revenue,
         |       count(*) AS n
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY 1 ORDER BY ALL""".stripMargin,
    "q_join_theta" ->
      s"""SELECT p_brand, count(*) AS n, ${dsum("l_extendedprice")} AS total
         |FROM lineitem JOIN part
         |ON l_partkey = p_partkey AND l_quantity < p_size
         |GROUP BY 1 ORDER BY ALL""".stripMargin,

    // ---- §2.4 aggregations ----
    "q_agg_global" ->
      s"""SELECT count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
         |       ${dsum("l_extendedprice")} AS sum_price,
         |       min(l_extendedprice) AS min_price,
         |       max(l_extendedprice) AS max_price,
         |       round(avg(l_quantity), 4) AS avg_qty,
         |       round(avg(l_extendedprice), 4) AS avg_price
         |FROM lineitem""".stripMargin,
    "q_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       round(sum(l_quantity), 4) AS sum_qty,
         |       ${dsum("l_extendedprice")} AS sum_base_price,
         |       ${dsumExact(discPrice)} AS sum_disc_price,
         |       ${dsumExact(charge)} AS sum_charge,
         |       round(avg(l_quantity), 4) AS avg_qty,
         |       round(avg(l_extendedprice), 4) AS avg_price,
         |       round(avg(l_discount), 4) AS avg_disc,
         |       count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY ALL""".stripMargin,
    "q_agg_having" ->
      """SELECT c_nationkey, count(*) AS n FROM customer
        |GROUP BY 1 HAVING count(*) > 55 ORDER BY ALL""".stripMargin,
    "q_agg_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY ALL""".stripMargin,
    "q_agg_rollup" ->
      s"""SELECT coalesce(n_name, '(all)') AS g_nation,
         |       coalesce(c_mktsegment, '(all)') AS g_segment,
         |       count(*) AS n, ${dsum("c_acctbal")} AS bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP(n_name, c_mktsegment) ORDER BY ALL""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS g_flag,
        |       coalesce(l_linestatus, '(all)') AS g_status,
        |       count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY ALL""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT coalesce(lang, '(all)') AS g_lang,
        |       coalesce(source, '(all)') AS g_source,
        |       count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY ALL""".stripMargin,
    // q_approx_distinct: intentionally omitted (estimate is engine-specific;
    // bounded vs exact in ScalaTest — SURVEY §2.4).

    // ---- §2.6 sorts / top-k ----
    "q_orderby_limit" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |  FROM lineitem
        |  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |  LIMIT 20) ORDER BY ALL""".stripMargin,
    "q_sort_multi" ->
      """SELECT r_name, n_name, n_nationkey
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY ALL""".stripMargin,

    // ---- §2.7 set operations ----
    "q_union_all" ->
      """SELECT o_orderkey, count(*) AS n FROM (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 100000)
        |GROUP BY 1 ORDER BY ALL""".stripMargin,
    "q_union_distinct" ->
      """SELECT * FROM (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY ALL""".stripMargin,
    "q_intersect" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY ALL""".stripMargin,
    "q_except" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders)
        |ORDER BY ALL""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY ALL""".stripMargin
  )
}
