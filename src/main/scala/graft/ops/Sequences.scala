package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 event-sequence dynamics (SURVEY §2.89): per-user type-switch
  * propensity rolled to rate bands, the inter-event dwell-time
  * distribution per event type over fixed log-ish bands, and the
  * A→B→A ping-pong pattern counts per type pair — the sequence-mining
  * readouts next to q_markov / q_seq_pairs / q_path_trigrams.
  *
  * Scale: every window partitions by user_id (the §2.9 sequence
  * convention — parallel across users, state is one lag row); outputs
  * roll up to band/type-pair dimensions, never user-sized.
  */
object Sequences {

  private def ordered(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), expr("unix_micros(ts)").as("us"))

  private val wU = Window.partitionBy("user_id").orderBy("us", "event_id")

  /** Switch-rate bands (§2.89): per user, the share of consecutive
    * event pairs that CHANGE type, in bp; users roll up to five fixed
    * rate bands (0–2000, …, 8000–10000) with user and transition
    * counts. Users with < 2 events are reported in band −1 (no
    * transitions — the denominator guard made explicit). */
  def qSwitchRate(s: SparkSession, dir: String): DataFrame = {
    val sw = ordered(s, dir)
      .withColumn("prev", lag("event_type", 1).over(wU))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("prev").isNotNull &&
          col("prev") =!= col("event_type"), 1L).otherwise(0L))
          .cast("long").as("n_switch"))
      .withColumn("n_trans", col("n_events") - 1)
      .withColumn("band", expr(
        "CASE WHEN n_trans = 0 THEN CAST(-1 AS BIGINT) " +
          "ELSE least(n_switch * 10000 div n_trans, 9999) div 2000 END"))
    orderedAll(sw.groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        sum("n_trans").cast("long").as("n_trans"),
        sum("n_switch").cast("long").as("n_switch")))
  }

  /** Dwell-time distribution (§2.89): the gap to the user's PREVIOUS
    * event, attributed to the later event's type, over six fixed bands
    * (<1 s, <10 s, <1 min, <10 min, <1 h, ≥1 h) — per (type, band):
    * count and within-type share bp. First events (no gap) are
    * excluded; the bands are exact integer µs thresholds. */
  def qDwellBins(s: SparkSession, dir: String): DataFrame = {
    val gaps = ordered(s, dir)
      .withColumn("gap", col("us") - lag("us", 1).over(wU))
      .filter(col("gap").isNotNull)
      .withColumn("band", expr(
        "CAST(CASE WHEN gap < 1000000 THEN 0 " +
          "WHEN gap < 10000000 THEN 1 " +
          "WHEN gap < 60000000 THEN 2 WHEN gap < 600000000 THEN 3 " +
          "WHEN gap < 3600000000 THEN 4 ELSE 5 END AS BIGINT)"))
    val perType = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"))
    orderedAll(gaps.groupBy("event_type", "band")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(perType), "event_type")
      .withColumn("share_bp", expr("n * 10000 div n_gaps"))
      .select("event_type", "band", "n", "n_gaps", "share_bp"))
  }

  /** Ping-pong patterns (§2.89): consecutive triples A→B→A with
    * A ≠ B per user, counted per unordered-entry (a = first, b =
    * middle) type pair — the oscillation signal that separates
    * browsing loops from funnels. Two lags per user window; output is
    * ≤ types² rows. */
  def qPingPong(s: SparkSession, dir: String): DataFrame =
    orderedAll(ordered(s, dir)
      .withColumn("p1", lag("event_type", 1).over(wU))
      .withColumn("p2", lag("event_type", 2).over(wU))
      .filter(col("p2").isNotNull && col("p2") === col("event_type") &&
        col("p1") =!= col("event_type"))
      .groupBy(col("event_type").as("a"), col("p1").as("b"))
      .agg(count(lit(1)).as("n_pingpong"),
        countDistinct(col("user_id")).as("n_users")))
}
