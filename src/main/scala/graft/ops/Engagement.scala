package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 engagement-analytics batch (SURVEY §2.50): the three
  * product-health readouts between q_events_retention (week-shift) and
  * q_growth_accounting (new/retained/churned) — cross-feature user
  * overlap (which event types share an audience), the active-days
  * engagement histogram, and DAU/MAU stickiness. All-integer; every
  * query collapses raw events to a distinct (user, key) set in one
  * mergeable aggregate before any pairing or window — the 100 TB shape.
  */
object Engagement {

  /** Event-type affinity (§2.50): for every unordered type pair, the
    * users active in both and the audience Jaccard in basis points —
    * the bipartite user–type co-engagement projection (q_brand_affinity
    * runs the same shape over order baskets; this one runs over user
    * feature sets, the product question). Pairs generate IN-ROW from
    * each user's sorted type array (≤ C(|types|, 2) per user — bounded
    * by the type vocabulary, not the corpus); margins ride a broadcast. */
  def qTypeAffinity(s: SparkSession, dir: String): DataFrame = {
    val sets = t(s, dir, "events")
      .groupBy("user_id")
      .agg(array_sort(collect_set(col("event_type"))).as("ts"))
    val marg = sets.select(explode(col("ts")).as("et"))
      .groupBy("et").agg(count(lit(1)).as("nm"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(ts, (x, i) ->
          |  transform(slice(ts, i + 2, size(ts)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    orderedAll(pairs
      .join(broadcast(marg.withColumnRenamed("et", "type_a")
        .withColumnRenamed("nm", "n_a")), "type_a")
      .join(broadcast(marg.withColumnRenamed("et", "type_b")
        .withColumnRenamed("nm", "n_b")), "type_b")
      .withColumn("jaccard_bp",
        expr("n_both * 10000 div (n_a + n_b - n_both)"))
      .select("type_a", "type_b", "n_both", "n_a", "n_b", "jaccard_bp"))
  }

  /** Active-days engagement histogram (§2.50): how many users were
    * active exactly d distinct days — the engagement-depth distribution
    * a product health dashboard leads with (its left mass is churn
    * risk, its right mass is the core). Two mergeable aggregates
    * ((user, day) distinct → per-user count → histogram); output is
    * ≤ |days| rows. */
  def qActiveDays(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .groupBy("user_id").agg(count(lit(1)).as("days_active"))
      .groupBy("days_active").agg(count(lit(1)).as("n_users")))

  /** DAU/MAU stickiness per event type (§2.50): mean daily active users
    * over the window divided by the window's total active users, in
    * basis points — stickiness_bp = Σ_day DAU_day · 10⁴ div
    * (n_days · window_actives). The habit-strength number (60%+ means
    * daily habit). ΣDAU comes from the distinct (type, day, user) set;
    * the divisor counts the distinct (type, user) set — both one
    * mergeable aggregate from the same projected scan. */
  def qStickiness(s: SparkSession, dir: String): DataFrame = {
    val tdu = t(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
    val dau = tdu.groupBy("event_type")
      .agg(count(lit(1)).as("sum_dau"),
        countDistinct(col("day")).as("n_days"))
    val mau = tdu.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("actives"))
    orderedAll(dau.join(mau, "event_type")
      .withColumn("stickiness_bp",
        expr("sum_dau * 10000 div (n_days * actives)"))
      .select("event_type", "n_days", "sum_dau", "actives",
        "stickiness_bp"))
  }
}
