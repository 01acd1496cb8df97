package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 causal-measurement batch (SURVEY §2.40, twenty-fifth widening
  * pass): the readouts an experimentation platform layers on top of the
  * §2.35 two-sample tests once it has to DECIDE — CUPED variance-reduced
  * lift, difference-in-differences, the sample-ratio-mismatch trust gate,
  * and Cramér's V effect size for categorical association.
  *
  * Determinism policy (§5.3): `value` quantizes to integer cents, and the
  * per-user covariate/metric sums further truncate to whole DOLLARS
  * (`cents div 100` PER EVENT, then exact BIGINT sums — the truncation
  * point is part of the contract so both engines agree bit-for-bit).
  * Slopes/effects are emitted in milli-units via the q_price_elasticity
  * integer-division recipe; chi-square statistics quantize expectations
  * to ×10³ before the (obs−exp)²/exp division, keeping every intermediate
  * an exact BIGINT. `div`/`//` truncate toward zero identically in both
  * engines (verified in Oracles.scala §2.35 header).
  *
  * Scale shape (100 TB): every query is one events scan collapsing to a
  * bounded key — (user), (user, type), (day, type), or (type, dow) — then
  * arithmetic over the collapsed table; the only broadcasts are the
  * ≤|types| type list and 1-row grand totals. Int64 headroom bounds are
  * documented per query. */
object Causal {

  /** Exact integer cents of the events value column. */
  private def cents: Column = expr("CAST(round(value * 100) AS BIGINT)")

  /** The §2.27 pre/post cutoff shared with q_abtest / q_drift. */
  private def preCol: Column =
    col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'")

  /** CUPED variance-reduced readout per event type: units are the users
    * with ≥1 event of that type; assignment is the platform's
    * deterministic hash bucketing, here `user_id % 2` (this fixture has
    * no real arms — every user does every type, so a behavioral control
    * group is empty; the %2 A/A split is exactly how CUPED machinery is
    * validated pre-launch). Metric y = the user's POST-period dollars of
    * the type, covariate x = the user's PRE-period dollars of the same
    * type — pre-assignment, the textbook CUPED covariate. θ is the
    * pooled OLS slope of y on x (milli-units, the q_price_elasticity
    * recipe) and the adjusted lift subtracts θ·(x̄_t − x̄_c):
    * effect_cuped = effect_raw − θ·Δx̄, all exact milli-dollar integers.
    *
    * Int64 headroom: per-user dollar sums ≤ ~10⁵ keep n·Σxy < 2⁶³ up to
    * ~10⁹ users — documented bound, far above any real cohort.
    *
    * Scale shape: one scan → one (user, type)-keyed mergeable aggregate
    * (the natural unit axis) → one 8-moment mergeable aggregate per
    * type. Nothing user-sized is ever broadcast or collected. */
  def qCuped(s: SparkSession, dir: String): DataFrame = {
    val units = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT) div 100").as("dollars"),
        preCol.as("pre"))
      .groupBy(col("user_id"), col("event_type").as("tt"))
      .agg(sum(when(col("pre"), col("dollars")).otherwise(0L)).as("x"),
        sum(when(col("pre"), lit(0L)).otherwise(col("dollars"))).as("y"))
      .withColumn("treat", expr("user_id % 2 = 1"))
    orderedAll(units.groupBy("tt")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
        sum(when(col("treat"), 1L).otherwise(0L)).cast("long").as("nt"),
        sum(when(col("treat"), col("x")).otherwise(0L)).as("sxt"),
        sum(when(col("treat"), col("y")).otherwise(0L)).as("syt"))
      .withColumn("theta_milli", expr(
        "(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)"))
      .withColumn("raw_milli", expr(
        "syt * 1000 div nt - (sy - syt) * 1000 div (n - nt)"))
      .withColumn("dx_milli", expr(
        "sxt * 1000 div nt - (sx - sxt) * 1000 div (n - nt)"))
      .withColumn("cuped_milli", expr(
        "raw_milli - theta_milli * dx_milli div 1000"))
      .select("tt", "n", "nt", "theta_milli", "raw_milli",
        "cuped_milli"))
  }

  /** Difference-in-differences per treatment type vs the 'view' baseline
    * across the shared pre/post cutoff: the four cell means (event-level
    * mean cents, exact integer division) and
    * did_c = (t_post − t_pre) − (v_post − v_pre) — the first-order
    * causal readout when assignment isn't randomized but trends are
    * parallel. One conditional aggregate per arm over a single scan; the
    * 1-row baseline cell rides a broadcast. */
  def qDid(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), cents.as("cents"), preCol.as("pre"))
    def cells(df: DataFrame, p: String): DataFrame = df
      .groupBy("event_type")
      .agg(
        sum(when(col("pre"), 1L).otherwise(0L)).cast("long")
          .as(s"n_pre$p"),
        sum(when(col("pre"), col("cents")).otherwise(0L))
          .as(s"s_pre$p"),
        sum(when(col("pre"), 0L).otherwise(1L)).cast("long")
          .as(s"n_post$p"),
        sum(when(col("pre"), lit(0L)).otherwise(col("cents")))
          .as(s"s_post$p"))
    val treat = cells(e.filter(col("event_type") =!= "view"), "_t")
    val base = cells(e.filter(col("event_type") === "view"), "_v")
      .drop("event_type")
    orderedAll(treat.crossJoin(broadcast(base))
      .withColumn("m_pre_t", expr("s_pre_t div n_pre_t"))
      .withColumn("m_post_t", expr("s_post_t div n_post_t"))
      .withColumn("m_pre_v", expr("s_pre_v div n_pre_v"))
      .withColumn("m_post_v", expr("s_post_v div n_post_v"))
      .withColumn("did_c", expr(
        "(m_post_t - m_pre_t) - (m_post_v - m_pre_v)"))
      .select("event_type", "n_pre_t", "n_post_t", "m_pre_t",
        "m_post_t", "m_pre_v", "m_post_v", "did_c"))
  }

  /** Sample-ratio-mismatch audit: per DAY, the chi-square distance (×10³)
    * between that day's event-type mix and the global mix — the trust
    * gate run before reading ANY experiment metric (a mismatched mix
    * means broken logging or assignment, not a treatment effect).
    * exp_m = day_total·type_total·10³ div grand is the ×10³-quantized
    * expected count; χ²_e3 = Σ_types (obs·10³ − exp_m)² div exp_m. The
    * `srm_flag` marks days past the df=4, α=0.001 critical value 18.467.
    *
    * Int64 headroom: (obs·10³)² requires day totals < ~3·10⁶ events;
    * beyond that drop the quantization to ×10² — documented, not gated,
    * since per-day-per-type counts at 100 TB collapse upstream anyway.
    *
    * Scale shape: one scan → (day, type) counts (mergeable), broadcast
    * type totals (≤|types| rows) + 1-row grand total, arithmetic on the
    * collapsed ≤days×types table. */
  def qSrm(s: SparkSession, dir: String): DataFrame = {
    val dt = t(s, dir, "events")
      .groupBy(expr("CAST(unix_micros(ts) AS BIGINT) div 86400000000")
        .as("day"), col("event_type"))
      .agg(count(lit(1)).as("obs"))
    val tyTot = dt.groupBy("event_type").agg(sum("obs").as("ty_n"))
    val grand = tyTot.agg(sum("ty_n").as("g_n"))
    val dayTot = dt.groupBy("day").agg(sum("obs").as("day_n"))
    orderedAll(dt
      .join(broadcast(tyTot), "event_type")
      .join(dayTot, "day")
      .crossJoin(broadcast(grand))
      .withColumn("exp_m", expr("day_n * ty_n * 1000 div g_n"))
      .withColumn("contrib_e3", expr(
        "(obs * 1000 - exp_m) * (obs * 1000 - exp_m) div exp_m"))
      .groupBy("day")
      .agg(max("day_n").as("n_day"),
        sum("contrib_e3").cast("long").as("chi2_e3"))
      .withColumn("srm_flag", col("chi2_e3") > lit(18467L)))
  }

  /** Cramér's V between event type and day-of-week ((epoch_day + 4) % 7,
    * 0 = Monday): the normalized effect size that says whether a
    * categorical association is real-world-large, not just significant —
    * the seasonality-by-arm interaction check. Same ×10³ chi-square
    * quantization as q_srm; v2_bp = χ²_e3·10⁴ div (10³·n·min(r−1,c−1))
    * is V² in exact basis points. One scan → ≤ types×7 contingency cells
    * → 1 summary row; margins ride broadcasts. */
  def qCramersV(s: SparkSession, dir: String): DataFrame = {
    val cell = t(s, dir, "events")
      .groupBy(col("event_type"),
        expr("(CAST(unix_micros(ts) AS BIGINT) div 86400000000 + 4) % 7")
          .as("dow"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = cell.groupBy("event_type").agg(sum("obs").as("r_n"))
    val colTot = cell.groupBy("dow").agg(sum("obs").as("c_n"))
    orderedAll(cell
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "dow")
      .crossJoin(broadcast(rowTot.agg(sum("r_n").as("n"),
        count(lit(1)).as("r")).crossJoin(
        colTot.agg(count(lit(1)).as("c")))))
      .withColumn("exp_m", expr("r_n * c_n * 1000 div n"))
      .withColumn("contrib_e3", expr(
        "(obs * 1000 - exp_m) * (obs * 1000 - exp_m) div exp_m"))
      .groupBy("n", "r", "c")
      .agg(sum("contrib_e3").cast("long").as("chi2_e3"))
      .withColumn("v2_bp", expr(
        "chi2_e3 * 10000 div (1000 * n * least(r - 1, c - 1))"))
      .select("n", "r", "c", "chi2_e3", "v2_bp"))
  }

  /** Simpson's-paradox detector (§2.98): per market segment, the SIGN
    * of the covariance between a customer's account balance and their
    * total order spend, against the pooled sign — a reversal
    * (segment sign ≠ pooled sign) is the aggregation trap every
    * observational read of this pair would fall into. Signs come from
    * the EXACT integer covariance numerator n·Σxy − Σx·Σy in
    * DECIMAL(38,0) (≈10²⁰ at sf0.1 — past BIGINT), so the boundary
    * decision never flaps; one customer-grain collapse feeds both the
    * segment and pooled moments. */
  def qTrendReversal(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"),  col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("x"))
      .join(t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("y")),
        col("c_custkey") === col("o_custkey"))
    def covSign(df: DataFrame, keys: Seq[String]): DataFrame = {
      val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys.head,
        keys.tail: _*)
      g.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .withColumn("sign", expr(
          "CAST(sign(CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy) AS BIGINT)"))
    }
    val pooled = covSign(cust, Nil)
      .select(col("sign").as("pooled_sign"))
    orderedAll(covSign(cust, Seq("c_mktsegment"))
      .crossJoin(broadcast(pooled))
      .withColumn("reversal", col("sign") =!= col("pooled_sign"))
      .select("c_mktsegment", "n", "sign", "pooled_sign", "reversal"))
  }
}
