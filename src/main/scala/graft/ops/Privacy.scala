package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 privacy-risk audits (SURVEY §2.86), completing the
  * anonymity family (q_kanon, q_ldiversity): t-closeness of each
  * quasi-group's sensitive distribution (ordered-EMD in bp),
  * re-identification risk as a function of quasi-identifier WIDTH (the
  * dimensionality-cost curve), and the row-suppression cost of
  * enforcing k ≥ 5. Quasi set: (c_nationkey, c_mktsegment [, balance
  * kilo-band]); sensitive attribute: the balance kilo-band.
  *
  * Scale: every query collapses rows to quasi-group × band counts
  * first (mergeable); grids are |groups|·|bands| broadcast-sized.
  * All-integer bp arithmetic — truncation points mirrored exactly in
  * the DuckDB twins.
  */
object Privacy {

  private def cust(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      col("c_nationkey").cast("long").as("nationkey"),
      col("c_mktsegment").as("mktsegment"),
      expr("CAST(round(c_acctbal) AS BIGINT) div 1000").as("band"))

  /** t-closeness (§2.86): per quasi-group (nation, segment), the
    * ordered-categorical earth-mover distance between the group's
    * sensitive-band distribution and the corpus distribution, in bp:
    * EMD = Σ_b |cumshare_g − cumshare_all| div (B−1) over the GLOBAL
    * band set (missing bands count zero). Shares truncate to bp before
    * cumulating — the declared quantization point. */
  def qTcloseness(s: SparkSession, dir: String): DataFrame = {
    val c = cust(s, dir)
    val bands = c.select("band").distinct()
    val groups = c.groupBy("nationkey", "mktsegment")
      .agg(count(lit(1)).as("k"))
    val cellCnt = c.groupBy("nationkey", "mktsegment", "band")
      .agg(count(lit(1)).as("c"))
    val globCnt = c.groupBy("band").agg(count(lit(1)).as("g"))
    val tot = c.agg(count(lit(1)).as("n"))
    val nB = bands.agg(count(lit(1)).as("n_bands"))
    val grid = groups.crossJoin(broadcast(bands))
      .join(cellCnt, Seq("nationkey", "mktsegment", "band"), "left")
      .join(broadcast(globCnt), Seq("band"))
      .crossJoin(broadcast(tot))
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("sh_g_bp", expr("c * 10000 div k"))
      .withColumn("sh_all_bp", expr("g * 10000 div n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("nationkey", "mktsegment").orderBy("band")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    orderedAll(grid
      .withColumn("cum_g", sum("sh_g_bp").over(w))
      .withColumn("cum_all", sum("sh_all_bp").over(w))
      .groupBy("nationkey", "mktsegment")
      .agg(max("k").as("k"),
        sum(expr("abs(cum_g - cum_all)")).cast("long").as("sum_absdiff"))
      .crossJoin(broadcast(nB))
      .withColumn("emd_bp", expr("sum_absdiff div (n_bands - 1)"))
      .select("nationkey", "mktsegment", "k", "emd_bp"))
  }

  /** Re-identification curve (§2.86): for each quasi-identifier PREFIX
    * width (1 = nation, 2 = +segment, 3 = +kilo-band), the group count,
    * unique rows (k = 1), rows in k < 5 groups, and the at-risk row
    * share in bp — the "what does one more column cost" readout that
    * decides generalization policy. Three mergeable aggregates unioned
    * (widths are a 3-element static set). */
  def qQuasiWidth(s: SparkSession, dir: String): DataFrame = {
    val c = cust(s, dir)
    def level(width: Int, cols: Seq[String]): DataFrame =
      c.groupBy(cols.map(col): _*).agg(count(lit(1)).as("k"))
        .agg(lit(width.toLong).as("width"),
          count(lit(1)).as("n_groups"),
          sum(when(col("k") === 1, 1L).otherwise(0L)).cast("long")
            .as("n_unique"),
          sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("long")
            .as("rows_at_risk"),
          sum("k").cast("long").as("n_rows"))
    orderedAll(level(1, Seq("nationkey"))
      .unionAll(level(2, Seq("nationkey", "mktsegment")))
      .unionAll(level(3, Seq("nationkey", "mktsegment", "band")))
      .withColumn("risk_bp", expr("rows_at_risk * 10000 div n_rows"))
      .select("width", "n_groups", "n_unique", "rows_at_risk", "risk_bp"))
  }

  /** Suppression cost (§2.86): enforcing k ≥ 5 on the WIDEST quasi set
    * by row suppression — per nation, the rows lost (members of k < 5
    * groups), the groups lost, and the cost share in bp. The
    * generalize-vs-suppress decision input. */
  def qSuppressionCost(s: SparkSession, dir: String): DataFrame = {
    val g = cust(s, dir)
      .groupBy("nationkey", "mktsegment", "band")
      .agg(count(lit(1)).as("k"))
    orderedAll(g.groupBy("nationkey")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("k") < 5, 1L).otherwise(0L)).cast("long")
          .as("groups_lost"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("long")
          .as("rows_lost"),
        sum("k").cast("long").as("n_rows"))
      .withColumn("cost_bp", expr("rows_lost * 10000 div n_rows"))
      .select("nationkey", "n_groups", "groups_lost", "rows_lost",
        "n_rows", "cost_bp"))
  }
}
