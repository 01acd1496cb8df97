package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 cohort-economics readouts (SURVEY §2.74): the cumulative
  * LTV curve per first-activity cohort (the revenue shape under
  * q_cohort's retention counts), monthly ARPU with purchase
  * conversion, and the cohort payback week against a fixed
  * acquisition-cost threshold. Facts collapse to (cohort, offset) or
  * month grids before any window; all money is exact cents. */
object Ltv {

  /** Per-user first week + per-(cohort, offset) purchase cents. */
  private def grid(s: SparkSession, dir: String): DataFrame = {
    val evs = t(s, dir, "events")
      .withColumn("week", expr("unix_micros(ts) div 604800000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val firsts = evs.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val sizes = firsts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"))
    evs.join(firsts, "user_id")
      .filter(col("event_type") === "purchase")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        sum("cents").cast("long").as("rev_cents"))
      .join(broadcast(sizes), "cohort_week")
  }

  /** Cohort LTV curve (§2.74): per (cohort week, week offset), the
    * purchase count, revenue cents, and CUMULATIVE revenue per cohort
    * user in milli-cents — the curve whose asymptote prices an
    * acquisition. The cumulative window runs over the ≤ weeks² grid. */
  def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedAll(grid(s, dir)
      .withColumn("cum_cents", sum("rev_cents").over(w))
      .withColumn("ltv_milli", expr("cum_cents * 1000 div n_users"))
      .select("cohort_week", "week_offset", "n_users", "n_purchases",
        "rev_cents", "ltv_milli"))
  }

  /** Monthly ARPU (§2.74): per 30-day bucket, active users,
    * purchasers, revenue cents, ARPU milli-cents and purchase
    * conversion bp — the top-line unit-economics table. One
    * user-keyed collapse then a month fold. */
  def qArpu(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .withColumn("month", expr("unix_micros(ts) div 2592000000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("month", "user_id")
      .agg(sum(when(col("event_type") === "purchase", col("cents"))
        .otherwise(0L)).cast("long").as("rev"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("bought"))
      .groupBy("month")
      .agg(count(lit(1)).as("active_users"),
        sum("bought").cast("long").as("purchasers"),
        sum("rev").cast("long").as("rev_cents"))
      .withColumn("arpu_milli", expr("rev_cents * 1000 div active_users"))
      .withColumn("conversion_bp",
        expr("purchasers * 10000 div active_users")))

  /** Cohort payback week (§2.74): per cohort, the first week offset
    * at which cumulative purchase revenue per user reaches the fixed
    * $10 acquisition threshold (1 000 000 milli-cents) — NULL when the
    * observed horizon never pays back. Derived from the LTV grid; the
    * argmin is a ≤weeks-row fold per cohort. */
  def qPayback(s: SparkSession, dir: String): DataFrame = {
    orderedAll(grid(s, dir)
      .withColumn("ltv_milli", expr(
        "CAST(sum(rev_cents) OVER (PARTITION BY cohort_week " +
          "ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING " +
          "AND CURRENT ROW) AS BIGINT) * 1000 div n_users"))
      .groupBy("cohort_week")
      .agg(max("n_users").as("n_users"),
        max("ltv_milli").as("final_ltv_milli"),
        min(when(col("ltv_milli") >= 1000000L, col("week_offset")))
          .as("payback_week")))
  }
}
