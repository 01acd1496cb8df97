package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 nonparametric statistics (SURVEY §2.85): rank-concordance
  * via the contingency-table Kendall counts (Goodman–Kruskal gamma —
  * the sqrt-free concordance coefficient), the Wald–Wolfowitz runs
  * readout per event type, and delete-one-stratum jackknife means.
  * All-integer emissions; pair products ride DECIMAL(38,0) (DuckDB:
  * HUGEINT) since cell-count products wrap BIGINT at warehouse scale.
  *
  * Scale shapes: Kendall runs on the CONTINGENCY CELLS (bounded by the
  * small discrete domains, ~550 cells — the cell-pair join is
  * broadcast-sized no matter the fact count); runs-test state is one
  * lag window partitioned by type (the §2.9 event-sequence
  * convention); jackknife is one grouped aggregate + a broadcast
  * totals row.
  */
object Nonparam {

  /** Kendall concordance via contingency cells (§2.85): per return
    * flag, concordant/discordant pair counts between quantity units
    * and discount cents, and Goodman–Kruskal gamma ×10³ =
    * (C−D)·1000 div (C+D) — the tie-robust, sqrt-free rank
    * correlation. Facts collapse to ≤ 50×11 cells per flag first;
    * the pair double-count runs over cells, never rows. */
  def qKendall(s: SparkSession, dir: String): DataFrame = {
    // Int64 note: C/D emit as BIGINT — exact to ~10¹⁸ comparable pairs;
    // past that (≳10⁹-row flags) the emission itself moves to
    // DECIMAL(38,0), same boundary note as q_graph_modularity.
    val cells = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("y"))
      .groupBy("flag", "x", "y").agg(count(lit(1)).as("c"))
    orderedAll(cells.as("a").join(cells.as("b"),
        col("a.flag") === col("b.flag") && col("a.x") < col("b.x"))
      .groupBy(col("a.flag").as("flag"))
      .agg(
        sum(expr("CASE WHEN a.y < b.y THEN " +
          "CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS " +
          "DECIMAL(38,0)) END")).as("cd"),
        sum(expr("CASE WHEN a.y > b.y THEN " +
          "CAST(a.c AS DECIMAL(38,0)) * b.c ELSE CAST(0 AS " +
          "DECIMAL(38,0)) END")).as("dd"))
      .select(col("flag"),
        col("cd").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"))
      .withColumn("gamma_milli", expr(
        "CASE WHEN concordant + discordant = 0 THEN NULL ELSE " +
          "(concordant - discordant) * 1000 div " +
          "(concordant + discordant) END")))
  }

  /** Wald–Wolfowitz runs readout (§2.85): per event type, events in
    * time order are signed above/at-or-below the TYPE MEAN (exact:
    * cents·n vs sum comparison — no float mean), runs counted as
    * 1 + sign changes, against the expected run count
    * 1 + 2·n_a·n_b/n in milli-units — randomness-of-sequence
    * deviation without the sqrt-bearing z. The sign lag is the §2.9
    * per-type ordered window (parallel across types); at 100 TB the
    * same seam-stitched day-partitioned carry as q_interval_overlap
    * applies — documented swap, the state is one bit. */
  def qRunsTest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val tot = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("s"))
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    orderedAll(e.join(broadcast(tot), "event_type")
      .withColumn("above", expr(
        "CASE WHEN CAST(cents AS DECIMAL(38,0)) * n > " +
          "CAST(s AS DECIMAL(38,0)) THEN CAST(1 AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END"))
      .withColumn("chg", when(lag("above", 1).over(w).isNull, 1L)
        .otherwise(when(col("above") =!= lag("above", 1).over(w), 1L)
          .otherwise(0L)))
      .groupBy("event_type")
      .agg(max("n").as("n"), sum("above").cast("long").as("n_above"),
        sum("chg").cast("long").as("n_runs"))
      .withColumn("n_below", expr("n - n_above"))
      .withColumn("expected_milli", expr(
        "1000 + CAST(2000 AS DECIMAL(38,0)) * n_above * n_below div n"))
      .withColumn("excess_milli",
        expr("n_runs * 1000 - expected_milli"))
      .select(col("event_type"), col("n"), col("n_above"), col("n_below"),
        col("n_runs"), col("expected_milli").cast("long").as("expected_milli"),
        col("excess_milli").cast("long").as("excess_milli")))
  }

  /** Delete-one-stratum jackknife (§2.85): per event type h, the
    * full-sample mean and the leave-type-out mean in milli-cents, and
    * the jackknife pseudo-value p_h = n·mean − (n−n_h)·mean₋ₕ — the
    * stratum-influence diagnostic behind q_bootstrap_ci's intervals.
    * One grouped aggregate + one 1-row broadcast; exact integer
    * divisions throughout. */
  def qJackknife(s: SparkSession, dir: String): DataFrame = {
    val st = t(s, dir, "events")
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_h"), sum("cents").cast("long").as("s_h"))
    val tot = st.agg(sum("n_h").cast("long").as("n"),
      sum("s_h").cast("long").as("s"))
    orderedAll(st.crossJoin(broadcast(tot))
      .withColumn("mean_full_milli", expr(
        "CAST(CAST(s AS DECIMAL(38,0)) * 1000 div n AS BIGINT)"))
      .withColumn("mean_loo_milli", expr(
        "CAST(CAST(s - s_h AS DECIMAL(38,0)) * 1000 div (n - n_h) " +
          "AS BIGINT)"))
      .withColumn("pseudo_milli", expr(
        "n * mean_full_milli - (n - n_h) * mean_loo_milli"))
      .select("event_type", "n_h", "mean_full_milli", "mean_loo_milli",
        "pseudo_milli"))
  }
}
