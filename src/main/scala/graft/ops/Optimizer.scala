package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 optimizer-statistics audits (SURVEY §2.81): the textbook
  * join-cardinality estimate (|R|·|S| / max(ndv)) scored against the
  * true join size, uniform-selectivity estimates for date-range
  * predicates scored against actual row counts, and soft functional-
  * dependency strength between low-cardinality columns — the three
  * numbers that explain WHY a cost-based plan was wrong. All exact
  * integer arithmetic over one or two aggregates per side. */
object Optimizer {

  /** Join-cardinality audit (§2.81): for the orders⋈lineitem and
    * customer⋈orders key joins, the uniform-assumption estimate
    * |R|·|S| div max(ndv_R, ndv_S) against the exact join
    * cardinality, error bp — the estimator every cost model starts
    * from, priced on this corpus. True size comes from the key-count
    * product per key (no join materialized — Σ n_a·n_b over the key
    * histogram). */
  def qJoinCardAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, left: DataFrame, lk: String,
              right: DataFrame, rk: String): DataFrame = {
      val la = left.groupBy(col(lk).as("k"))
        .agg(count(lit(1)).as("na"))
      val rb = right.groupBy(col(rk).as("k"))
        .agg(count(lit(1)).as("nb"))
      val joined = la.join(rb, "k")
        .agg(sum(expr("na * nb")).cast("long").as("actual"))
      val stats = left.agg(count(lit(1)).as("n1"),
        countDistinct(col(lk)).as("d1"))
        .crossJoin(right.agg(count(lit(1)).as("n2"),
          countDistinct(col(rk)).as("d2")))
      stats.crossJoin(joined)
        .select(lit(rel).as("rel"), col("n1"), col("n2"),
          greatest(col("d1"), col("d2")).as("max_ndv"),
          expr("n1 * n2 div greatest(d1, d2)").as("est"),
          col("actual"))
    }
    val a = audit("orders_lineitem",
      t(s, dir, "orders"), "o_orderkey",
      t(s, dir, "lineitem"), "l_orderkey")
    val b = audit("customer_orders",
      t(s, dir, "customer"), "c_custkey",
      t(s, dir, "orders"), "o_custkey")
    orderedAll(a.unionAll(b)
      .withColumn("err_bp", expr(
        "abs(est - actual) * 10000 div actual")))
  }

  /** Selectivity audit (§2.81): for three ship-date windows (30, 180,
    * 365 days from 1995-01-01), the uniform-assumption estimate
    * rows·window div span against the actual matching rows, error
    * bp — the range-predicate estimator audit. Span bounds and window
    * counts come from ONE scan's conditional aggregate. */
  def qSelectivityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "lineitem")
      .select(expr("unix_micros(l_shipdate) div 86400000000")
        .as("d"))
    val stats = base.agg(count(lit(1)).as("n"),
      min("d").as("lo"), max("d").as("hi"))
    val anchor = 9131L // 1995-01-01 in epoch days
    val windows = Seq(30L, 180L, 365L).toDF("win")
    orderedAll(base.crossJoin(broadcast(windows))
      .groupBy("win")
      .agg(sum(when(col("d") >= anchor &&
        col("d") < lit(anchor) + col("win"), 1L).otherwise(0L))
        .cast("long").as("actual"))
      .crossJoin(broadcast(stats))
      .withColumn("est", expr("n * win div (hi - lo + 1)"))
      .withColumn("err_bp", expr(
        "CASE WHEN actual = 0 THEN NULL " +
          "ELSE abs(est - actual) * 10000 div actual END"))
      .select("win", "n", "actual", "est", "err_bp"))
  }

  /** Soft functional-dependency strength (§2.81): for ordered pairs
    * of low-cardinality orders columns (status→priority,
    * priority→status, status→dow), the share of rows explained by
    * each determinant value's MODAL dependent — 10000 bp means a hard
    * FD the optimizer (or a normalizer) can exploit. One (a, b)
    * count collapse per pair; the modal pick is a max over ≤|a|·|b|
    * rows. */
  def qFdStrength(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("dow", expr(
        "(CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT) " +
          "+ 3) % 7 + 1"))
    def fd(rel: String, a: String, b: String): DataFrame = {
      val cells = o.groupBy(col(a).cast("string").as("av"),
        col(b).cast("string").as("bv"))
        .agg(count(lit(1)).as("n"))
      val modal = cells.groupBy("av")
        .agg(max("n").as("modal_n"), sum("n").as("n_rows"))
      modal.agg(count(lit(1)).as("n_determinants"),
        sum("n_rows").cast("long").as("n"),
        sum("modal_n").cast("long").as("explained"))
        .select(lit(rel).as("fd"), col("n_determinants"), col("n"),
          col("explained"))
    }
    orderedAll(fd("status_to_priority", "o_orderstatus",
      "o_orderpriority")
      .unionAll(fd("priority_to_status", "o_orderpriority",
        "o_orderstatus"))
      .unionAll(fd("status_to_dow", "o_orderstatus", "dow"))
      .withColumn("strength_bp", expr("explained * 10000 div n")))
  }
}
