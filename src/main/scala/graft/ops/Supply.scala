package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 supply-chain risk readouts (SURVEY §2.78): single-source
  * exposure (parts observed from exactly one supplier — the
  * procurement risk register), supplier dependency concentration
  * (suppliers whose revenue leans on one brand), and the cross-border
  * supply share per customer region (the tariff/latency exposure
  * number). All collapse the fact table to observed (part, supplier)
  * or (supplier, brand) pairs before any risk arithmetic. */
object Supply {

  /** Single-source exposure (§2.78): per part brand, how many parts
    * were EVER observed from exactly one supplier, their share bp,
    * and the cents flowing through single-sourced parts — the list a
    * procurement team dual-sources first. Observed pairs are one
    * distinct collapse; revenue joins back on the part key. */
  def qSingleSource(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val perPart = li.groupBy("l_partkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        sum("cents").as("cents"))
    orderedAll(perPart
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("n_supp") === 1, 1L).otherwise(0L)).cast("long")
          .as("single_sourced"),
        sum(when(col("n_supp") === 1, col("cents")).otherwise(0L))
          .cast("long").as("single_cents"),
        sum("cents").cast("long").as("cents"))
      .withColumn("single_bp", expr("single_sourced * 10000 div n_parts"))
      .select("p_brand", "n_parts", "single_sourced", "single_bp",
        "single_cents", "cents"))
  }

  /** Supplier dependency concentration (§2.78): per supplier, the
    * revenue share of its TOP brand in bp (the (rev, brand) total
    * order) and whether it crosses the 50% dependency line — the
    * "one customer away from trouble" register. Facts collapse to
    * (supplier, brand) partials; the rank window runs per supplier
    * over ≤|brands| rows. */
  def qSupplierDependency(s: SparkSession, dir: String): DataFrame = {
    val sb = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "p_brand")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("rev"))
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("rev").desc, col("p_brand").asc)
    orderedAll(sb
      .withColumn("rk", row_number().over(w))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_brands"),
        sum("rev").cast("long").as("tot_cents"),
        max(when(col("rk") === 1, col("p_brand"))).as("top_brand"),
        sum(when(col("rk") === 1, col("rev")).otherwise(0L))
          .cast("long").as("top_cents"))
      .withColumn("dep_bp", expr("top_cents * 10000 div tot_cents"))
      .withColumn("concentrated", col("dep_bp") >= 5000L)
      .select("l_suppkey", "n_brands", "tot_cents", "top_brand",
        "dep_bp", "concentrated"))
  }

  /** Cross-border supply share (§2.78): per customer region, the
    * share of line revenue where the supplier's nation differs from
    * the customer's — the tariff/latency exposure aggregate behind
    * the TPC-H Q7 pair report. Dims broadcast; the fact joins are the
    * slim Q5 shape (order→customer geo built first). */
  def qCrossNation(s: SparkSession, dir: String): DataFrame = {
    val custGeo = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_nationkey").as("cust_nation"),
        col("r_name"))
    val geoOrders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(custGeo, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"), col("r_name"))
    val supNation = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    orderedAll(t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(geoOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_lines"),
        sum("cents").cast("long").as("cents"),
        sum(when(col("s_nationkey") =!= col("cust_nation"),
          col("cents")).otherwise(0L)).cast("long").as("xborder_cents"))
      .withColumn("xborder_bp", expr("xborder_cents * 10000 div cents"))
      .select("r_name", "n_lines", "cents", "xborder_cents",
        "xborder_bp"))
  }

  /** Daily open-order backlog (§2.96): how many orders are in flight
    * each day — placed (o_orderdate) but not yet fully shipped (the
    * order's LAST l_shipdate closes it; the day after, it leaves the
    * backlog). The sweep-line recipe at the day grain: ±1 boundary
    * deltas are aggregated per day FIRST, then one prefix sum runs
    * over the tiny day spine — the scale-correct shape when events
    * collapse to a bounded calendar (contrast q_interval_overlap,
    * whose µs-grain points keep full cardinality and need the
    * DistRank-gated sweep). Orders with no lineitem never enter.
    * Only days with a boundary are emitted (the backlog is constant
    * between boundaries). */
  def qBacklog(s: SparkSession, dir: String): DataFrame = {
    val span = t(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("unix_micros(o_orderdate) div 86400000000").as("d0"))
      .join(t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(expr("max(unix_micros(l_shipdate) div 86400000000)")
          .as("d1")),
        col("o_orderkey") === col("l_orderkey"))
    val deltas = span
      .select(col("d0").as("day"), lit(1L).as("delta"))
      .unionAll(span.select((greatest(col("d1"), col("d0")) + 1)
        .as("day"), lit(-1L).as("delta")))
      .groupBy("day").agg(sum("delta").as("delta"))
    val wd = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedAll(deltas
      .withColumn("open_orders", sum("delta").over(wd).cast("long"))
      .select("day", "delta", "open_orders"))
  }
}
