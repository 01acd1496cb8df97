package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 seasonal-mix readouts (SURVEY §2.82): the weekend revenue
  * effect per market segment (weekday vs weekend daily-rate lift),
  * the ARPU mix-shift decomposition (did the average move because
  * segments changed their rate, or because the MIX of segments
  * changed? — the other half of q_price_volume_mix), and the
  * (weekday × hour) event heat grid (the capacity-planning classic).
  * Exact cents; epoch-day weekday arithmetic (no locale). */
object Seasonal {

  /** Weekend effect (§2.82): per market segment, the average daily
    * revenue rate (cents·milli per calendar day) on weekdays vs
    * weekends and the lift in bp — the staffing/promo scheduling
    * readout. Orders collapse to (segment, is_weekend, day) partials;
    * rates divide by the OBSERVED day counts of each kind. */
  def qWeekendEffect(s: SparkSession, dir: String): DataFrame = {
    val seg = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val d = t(s, dir, "orders")
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .withColumn("day", expr(
        "CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)"))
      .withColumn("wknd", expr("(day + 3) % 7 + 1 >= 6"))
      .withColumn("cents", expr(
        "CAST(round(o_totalprice * 100) AS BIGINT)"))
    orderedAll(d.groupBy("c_mktsegment")
      .agg(
        countDistinct(when(!col("wknd"), col("day"))).as("wd_days"),
        countDistinct(when(col("wknd"), col("day"))).as("we_days"),
        sum(when(!col("wknd"), col("cents")).otherwise(0L))
          .cast("long").as("wd_cents"),
        sum(when(col("wknd"), col("cents")).otherwise(0L))
          .cast("long").as("we_cents"))
      .withColumn("wd_rate_milli", expr(
        "CASE WHEN wd_days = 0 THEN NULL " +
          "ELSE wd_cents * 1000 div wd_days END"))
      .withColumn("we_rate_milli", expr(
        "CASE WHEN we_days = 0 THEN NULL " +
          "ELSE we_cents * 1000 div we_days END"))
      // the lift can be negative: the +10001·den offset keeps the
      // dividend positive so Spark div == DuckDB // (sign-safe policy)
      .withColumn("lift_bp", expr(
        "CASE WHEN wd_days = 0 OR we_days = 0 " +
          "OR wd_cents * 1000 div wd_days = 0 THEN NULL " +
          "ELSE ((we_cents * 1000 div we_days " +
          "- wd_cents * 1000 div wd_days) * 10000 " +
          "+ 10001 * (wd_cents * 1000 div wd_days)) " +
          "div (wd_cents * 1000 div wd_days) - 10001 END"))
      .select("c_mktsegment", "wd_days", "we_days", "wd_cents",
        "we_cents", "wd_rate_milli", "we_rate_milli", "lift_bp"))
  }

  /** ARPU mix-shift decomposition (§2.82): 1996→1997 change in
    * revenue-per-order split into the RATE effect (each segment's
    * per-order cents at the old mix) and the MIX effect (segment
    * share shift at the new rates), with an exact integer residual so
    * the identity holds under truncation — the q_price_volume_mix
    * construction on the customer-segment axis. All µ-cents-per-order
    * terms are floor divisions of exact integers. */
  def qMixShift(s: SparkSession, dir: String): DataFrame = {
    def year(y: Int, suf: String) = t(s, dir, "orders")
      .filter(expr(s"o_orderdate >= TIMESTAMP '$y-01-01 00:00:00'" +
        s" AND o_orderdate < TIMESTAMP '${y + 1}-01-01 00:00:00'"))
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as(s"n_$suf"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .cast("long").as(s"c_$suf"))
    orderedAll(year(1996, "a").join(year(1997, "b"), "c_mktsegment")
      .withColumn("rate_a_u", expr("c_a * 1000 div n_a"))
      .withColumn("rate_b_u", expr("c_b * 1000 div n_b"))
      .withColumn("rate_effect_u", expr(
        "(rate_b_u - rate_a_u) * n_a"))
      .withColumn("mix_effect_u", expr(
        "(n_b - n_a) * rate_b_u"))
      .withColumn("residual_u", expr(
        "(c_b - c_a) * 1000 - ((rate_b_u - rate_a_u) * n_a " +
          "+ (n_b - n_a) * rate_b_u)"))
      .select("c_mktsegment", "n_a", "n_b", "rate_a_u", "rate_b_u",
        "rate_effect_u", "mix_effect_u", "residual_u"))
  }

  /** Weekly heat grid (§2.82): events per (ISO weekday, UTC hour)
    * cell with the share bp of the week — the 7×24 capacity-planning
    * grid. One mergeable aggregate; the grid is constant-sized. */
  def qHeatGrid(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "events")
      .select(
        expr("(unix_micros(ts) div 86400000000 + 3) % 7 + 1")
          .as("dow"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("n"))
    val tot = g.agg(sum("n").cast("long").as("tot"))
    orderedAll(g.crossJoin(broadcast(tot))
      .withColumn("share_bp", expr("n * 10000 div tot"))
      .select("dow", "hour", "n", "share_bp"))
  }
}
