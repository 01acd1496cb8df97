package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 user-lifecycle readouts (SURVEY §2.94): daily new-vs-
  * returning actives (the DAU decomposition next to the monthly
  * q_growth_accounting), lifespan bands (first-to-last-seen span per
  * user), and reactivations (returns after a gap between active days
  * > 2, i.e. ≥ 2 fully absent days — see qReactivation). All
  * shapes: (user, day) distinct collapse first, then user-partitioned
  * windows or user-dim aggregates rolled to day/band dimensions. */
object Lifecycle {

  /** DISTINCT (user_id, epoch-day) activity rows. */
  private def userDays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()

  /** Daily new vs returning (§2.94): per day, distinct actives split by
    * first-ever-seen-today vs returning, with the new share in bp. The
    * first-seen day is one user-dim aggregate broadcast back. */
  def qNewVsReturning(s: SparkSession, dir: String): DataFrame = {
    val ud = userDays(s, dir)
    val first = ud.groupBy("user_id").agg(min("day").as("first_day"))
    orderedAll(ud.join(first, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .cast("long").as("n_new"))
      .withColumn("n_returning", expr("n_active - n_new"))
      .withColumn("new_share_bp", expr("n_new * 10000 div n_active")))
  }

  /** Activity-density bands (§2.94): per user, the share of their
    * first-to-last-seen span they were actually active
    * (n_days·10⁴ div span, bp), banded < 7000 / 7000–7999 / 8000–8999 /
    * ≥ 9000 — per band: users, active days, events. The engagement-
    * shape number behind q_active_days/q_stickiness (the fixture's
    * users all span the window, so SPAN itself is degenerate — density
    * is the discriminating axis). */
  def qLifespanBands(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val perUser = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("day").as("n_days"),
        (max("day") - min("day") + 1).as("span"))
    orderedAll(perUser
      .withColumn("density_bp", expr("n_days * 10000 div span"))
      .withColumn("band", expr(
        "CAST(CASE WHEN density_bp < 7000 THEN 0 " +
          "WHEN density_bp < 8000 THEN 1 WHEN density_bp < 9000 THEN 2 " +
          "ELSE 3 END AS BIGINT)"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        sum("n_days").cast("long").as("active_days"),
        sum("n_events").cast("long").as("n_events")))
  }

  /** Reactivations (§2.94): per day, users returning after ≥ 2 fully
    * absent days (distinct activity days per user, lag gap > 2) and the
    * share of that day's actives in bp — the winback readout, scaled to
    * the fixture's 30-day window (a 7-day bar is vacuous there). One
    * user-partitioned lag over the (user, day) rows. */
  def qReactivation(s: SparkSession, dir: String): DataFrame = {
    val ud = userDays(s, dir)
    val w = Window.partitionBy("user_id").orderBy("day")
    val marked = ud
      .withColumn("gap", col("day") - lag("day", 1).over(w))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("gap") > 2, 1L).otherwise(0L)).cast("long")
          .as("n_reactivated"))
    orderedAll(marked
      .withColumn("react_bp", expr("n_reactivated * 10000 div n_active"))
      .filter(col("n_reactivated") > 0))
  }

  /** Dormancy bands (§2.95): users banded by days since their LAST
    * activity, measured against the corpus max day (0 / 1 / 2–6 / 7+ —
    * cuts scaled to the fixture's 30-day window and near-daily actives;
    * a production winback board uses 7/14/30 with the identical plan) —
    * the targeting cut next to [[qReactivation]]'s realized returns:
    * band 1–2 users are reachable, band 3 is churn. Per band: users,
    * their average lifetime active days (integer div), total events.
    * One user-dim aggregate; the ref day is a broadcast scalar. */
  def qDormancy(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val perUser = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("day").as("n_days"), max("day").as("last_day"))
    val ref = perUser.agg(max("last_day").as("ref_day"))
    orderedAll(perUser.crossJoin(broadcast(ref))
      .withColumn("gap", col("ref_day") - col("last_day"))
      .withColumn("band", expr(
        "CAST(CASE WHEN gap < 1 THEN 0 WHEN gap < 2 THEN 1 " +
          "WHEN gap < 7 THEN 2 ELSE 3 END AS BIGINT)"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        expr("sum(n_days) div count(1)").as("avg_active_days"),
        sum("n_events").cast("long").as("n_events")))
  }

  /** Cumulative user growth (§2.97): per day, users seen for the
    * first time and the running total of distinct users ever seen —
    * the growth curve whose slope every launch review reads. The
    * distinct-user axis collapses to ONE row per user (min day)
    * before anything else, the day spine is bounded, and the running
    * total is a prefix sum over that tiny spine — never a
    * distinct-count over an expanding window (which would rescan
    * user×day at every step). Days with no first-timers don't emit
    * (the curve is flat there). */
  def qCumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    val firsts = t(s, dir, "events")
      .groupBy("user_id")
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val wd = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedAll(firsts
      .withColumn("cum_users", sum("new_users").over(wd).cast("long"))
      .select("day", "new_users", "cum_users"))
  }
}
