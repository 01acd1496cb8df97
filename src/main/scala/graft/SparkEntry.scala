package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per SURVEY §2 operator; `oracleSql` carries the
  * DuckDB twin (omitted for non-SQL-expressible ops).
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape, SURVEY §7.2) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans
    "q_scan_project" -> Relational.qScanProject _,
    "q_scan_count" -> Relational.qScanCount _,
    // §2.2 filters / predicates
    "q_filter_pred" -> Relational.qFilterPred _,
    "q_filter_in_like" -> Relational.qFilterInLike _,
    "q_case_expr" -> Relational.qCaseExpr _,
    // §2.3 joins
    "q_join_inner" -> Relational.qJoinInner _,
    "q_join_broadcast" -> Relational.qJoinBroadcast _,
    "q_join_left" -> Relational.qJoinLeft _,
    "q_join_full" -> Relational.qJoinFull _,
    "q_join_semi" -> Relational.qJoinSemi _,
    "q_join_anti" -> Relational.qJoinAnti _,
    "q_join_multiway" -> Relational.qJoinMultiway _,
    "q_join_theta" -> Relational.qJoinTheta _,
    // §2.4 aggregations
    "q_agg_global" -> Relational.qAggGlobal _,
    "q_agg_group" -> Relational.qAggGroup _,
    "q_agg_having" -> Relational.qAggHaving _,
    "q_agg_distinct" -> Relational.qAggDistinct _,
    "q_agg_rollup" -> Relational.qAggRollup _,
    "q_agg_cube" -> Relational.qAggCube _,
    "q_agg_grouping_sets" -> Relational.qAggGroupingSets _,
    "q_approx_distinct" -> Relational.qApproxDistinct _,
    // §2.6 sorts / top-k
    "q_orderby_limit" -> Relational.qOrderbyLimit _,
    "q_sort_multi" -> Relational.qSortMulti _,
    // §2.7 set operations
    "q_union_all" -> Relational.qUnionAll _,
    "q_union_distinct" -> Relational.qUnionDistinct _,
    "q_intersect" -> Relational.qIntersect _,
    "q_except" -> Relational.qExcept _,
    "q_distinct" -> Relational.qDistinct _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}
