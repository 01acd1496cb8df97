package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 remaining staples (SURVEY §2.93): the nth_value /
  * multi-offset lead-lag window surface (§2.5 completion), the
  * duplication-vs-quality cross (are duplicated docs worse?), and the
  * Sharpe-style risk-adjusted daily revenue number. */
object Staples {

  /** nth_value + multi-offset lead/lag (§2.93): per order priority
    * under the (totalprice desc, orderkey asc) total order, each of the
    * first 25 orders with the priority's 3rd-highest price
    * (nth_value over the FULL explicit frame — default frames differ
    * by engine, the pinned frame doesn't) and its lead(2)/lag(2)
    * neighbors. The §2.5 window-API completion row. */
  def qWindowNth(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") < 500)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
    val ord = Window.partitionBy("o_orderpriority")
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    orderedAll(o
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("third_cents", nth_value(col("cents"), 3).over(full))
      .withColumn("lead2", lead(col("o_orderkey"), 2).over(ord))
      .withColumn("lag2", lag(col("o_orderkey"), 2).over(ord))
      .filter(col("rn") <= 25)
      .select("o_orderpriority", "rn", "o_orderkey", "cents",
        "third_cents", "lead2", "lag2"))
  }

  /** Duplication × quality cross (§2.93): docs banded by their
    * prefix-hash duplicate-group size (1 / 2–3 / 4+, the q_dedup_exact
    * key) against two quality proxies — mean chars (exact milli) and
    * mean distinct-token ratio in bp. The "duplicated docs are worse"
    * readout that justifies dedup-before-filter ordering. One hash
    * aggregate + one broadcast-band join + one roll-up. */
  def qDupQuality(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("h", md5(concat_ws(" ", slice(tokens(col("text")), 1, 8))))
      .withColumn("toks", tokens(col("text")))
      .select(col("h"), col("n_chars"),
        size(col("toks")).cast("long").as("nt"),
        size(array_distinct(col("toks"))).cast("long").as("ndt"))
    val grp = docs.groupBy("h").agg(count(lit(1)).as("gs"))
    orderedAll(docs.join(grp, "h")
      .withColumn("band", expr(
        "CAST(CASE WHEN gs = 1 THEN 0 WHEN gs <= 3 THEN 1 ELSE 2 END" +
          " AS BIGINT)"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"),
        sum(expr("ndt * 10000 div nt")).cast("long").as("sum_ratio_bp"))
      .withColumn("mean_chars_milli", expr("sum_chars * 1000 div n_docs"))
      .withColumn("mean_uniq_bp", expr("sum_ratio_bp div n_docs"))
      .select("band", "n_docs", "mean_chars_milli", "mean_uniq_bp"))
  }

  /** Risk-adjusted daily revenue (§2.93): over daily order revenue
    * (exact cents per epoch-day), the mean, the population standard
    * deviation (one double sqrt of exact DECIMAL moments — the q_mcc
    * rounding convention), and sharpe_milli = round(mean·1000 / sd).
    * One day collapse + one 1-row moment fold. */
  def qSharpe(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "orders")
      .groupBy(expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
      .agg(count(lit(1)).as("n_days"),
        sum("cents").cast("long").as("total"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sq"))
      .withColumn("mean_cents", expr("total div n_days"))
      .withColumn("sd_cents", expr(
        "CAST(round(sqrt((CAST(sq AS DOUBLE) - CAST(total AS DOUBLE) " +
          "* total / n_days) / n_days)) AS BIGINT)"))
      .withColumn("sharpe_milli", expr(
        "CASE WHEN sd_cents = 0 THEN NULL ELSE " +
          "CAST(round(CAST(total AS DOUBLE) / n_days * 1000 / sd_cents)" +
          " AS BIGINT) END"))
      .select("n_days", "total", "mean_cents", "sd_cents", "sharpe_milli"))
}
