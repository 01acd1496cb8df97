package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 forensic-accounting audits (SURVEY §2.77): the
  * second-digit Benford profile (the follow-up test run when the
  * first digit — q_benford — looks clean; fabricated numbers fail it
  * first), round-number bias (the .00/.50/.99 cents excess that flags
  * hand-entered or psychologically-priced values), and the
  * duplicate-payment detector (same payer, same cents, same day —
  * the classic double-charge audit). All exact-cents conditional
  * aggregation; expected Benford shares ride as exact ×10⁴ integer
  * literals computed once in Scala and mirrored into the oracle. */
object Forensic {

  /** Second-digit Benford expectations ×10⁴: Σ_{d1=1..9}
    * log10(1 + 1/(10·d1 + d2)) for d2 = 0..9 — shared with the
    * oracle as literals so neither engine evaluates a log. */
  val benford2Bp: IndexedSeq[Long] = (0 to 9).map { d2 =>
    math.round((1 to 9).map(d1 =>
      math.log10(1.0 + 1.0 / (10 * d1 + d2))).sum * 10000)
  }

  /** Second-digit Benford audit (§2.77): per order status, the
    * second-digit distribution of totalprice cents against the
    * Benford-2 expectation, deviation in bp — values below 10 cents
    * (no second digit) are excluded in both engines. One scan +
    * conditional aggregate; the expectation is a 10-literal CASE. */
  def qBenford2(s: SparkSession, dir: String): DataFrame = {
    val expCase = benford2Bp.zipWithIndex
      .map { case (bp, d) => s"WHEN $d THEN ${bp}L" }
      .mkString("CASE digit ", " ", " ELSE 0L END")
    orderedAll(t(s, dir, "orders")
      .selectExpr("o_orderstatus AS status",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .filter(col("cents") >= 10L)
      .selectExpr("status",
        "CAST(substring(CAST(cents AS STRING), 2, 1) AS BIGINT) " +
          "AS digit")
      .groupBy("status", "digit")
      .agg(count(lit(1)).as("n"))
      .withColumn("status_n", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("status")))
      .withColumn("share_bp", expr("n * 10000 div status_n"))
      .withColumn("dev_bp", expr(s"share_bp - ($expCase)"))
      .select("status", "digit", "n", "share_bp", "dev_bp"))
  }

  /** Round-number bias (§2.77): per event type, the share of values
    * whose cents end in .00, .50, and .99 against the 1%-per-ending
    * uniform baseline — the hand-entry / psychological-pricing
    * detector. One conditional-aggregate scan. */
  def qRoundBias(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .withColumn("c2", expr(
        "pmod(CAST(round(value * 100) AS BIGINT), 100)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c2") === 0L, 1L).otherwise(0L)).cast("long")
          .as("n_00"),
        sum(when(col("c2") === 50L, 1L).otherwise(0L)).cast("long")
          .as("n_50"),
        sum(when(col("c2") === 99L, 1L).otherwise(0L)).cast("long")
          .as("n_99"))
      .withColumn("bias_bp", expr(
        "(n_00 + n_50 + n_99) * 10000 div n - 300")))

  /** Duplicate-payment detector (§2.77): per event type, groups of
    * payment-shaped duplicates — same user, same whole-dollar amount
    * (cents div 100: real double-charges drift by fee cents), same
    * UTC day, ≥ 2 occurrences — group count, duplicate rows beyond
    * the first, and the duplicated dollars at risk. Facts collapse to
    * the (user, dollars, day) key in one mergeable aggregate. */
  def qDupPayments(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT) div 100")
          .as("dollars"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "user_id", "dollars", "day")
      .agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum(expr("k - 1")).cast("long").as("n_dupes"),
        sum(expr("(k - 1) * dollars")).cast("long")
          .as("dollars_at_risk")))
}
