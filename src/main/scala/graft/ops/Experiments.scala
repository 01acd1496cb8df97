package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 experimentation / measurement-statistics batch (SURVEY §2.35,
  * twentieth widening pass): the statistics an experimentation or
  * data-quality platform runs over event streams — distribution-shift
  * tests (Kolmogorov–Smirnov, Mann–Whitney), a deterministic Poisson-ish
  * bootstrap CI, a stratified treatment-effect estimate, empirical-Bayes
  * shrinkage of per-entity means, and ordinal SAX symbolization of
  * per-user time series.
  *
  * Determinism policy (§5.3): `value` is quantized to integer cents
  * (`round(value*100)` — the q_ewma precedent) BEFORE any aggregate, so
  * every sum is an exact BIGINT; test statistics are emitted as exact
  * integer numerators (D·n₁n₂, 2·U, millicent effect sizes) with
  * basis-point integer divisions, so no float ever crosses an aggregate
  * boundary. The bootstrap's randomness is md5-portable (the
  * q_weighted_sample recipe), identical in both engines.
  *
  * Scale shape (100 TB): every query is scan → map-combining aggregate
  * on a bounded key (type, (type,cents), (type,replicate), user) →
  * windows only over per-key group counts (cents-histogram rows, ≤ ~20k
  * per type, never raw events) or per-user sequences (the natural
  * partition axis). Nothing collects; the only broadcast is a 4-row
  * type list. */
object Experiments {

  /** Exact integer cents of the events value column. */
  private def cents: Column = expr("CAST(round(value * 100) AS BIGINT)")

  /** Per-(treatment-type, cents) two-sample histogram against the 'view'
    * baseline: g1 = treatment count, g2 = baseline count at that cents
    * value. The cross join duplicating the baseline per treatment type is
    * broadcast-sized on the type side (4 rows) and histogram-compressed
    * before any window touches it. */
  private def pairHist(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), cents.as("cents"))
    val types = e.filter(col("event_type") =!= "view")
      .select(col("event_type").as("tt")).distinct()
    val treat = e.filter(col("event_type") =!= "view")
      .select(col("event_type").as("tt"), col("cents"),
        lit(1L).as("c1"), lit(0L).as("c2"))
    val base = e.filter(col("event_type") === "view")
      .crossJoin(broadcast(types))
      .select(col("tt"), col("cents"), lit(0L).as("c1"), lit(1L).as("c2"))
    treat.union(base)
      .groupBy("tt", "cents")
      .agg(sum("c1").as("g1"), sum("c2").as("g2"))
  }

  /** Two-sample Kolmogorov–Smirnov: for each non-view event type vs the
    * 'view' baseline, D = max |F1 − F2| over the shared cents grid,
    * emitted as the exact integer numerator d_num = max|c1·n2 − c2·n1|
    * and d_bp = ⌊d_num·10⁴ / (n1·n2)⌋ — the distribution-shift gate a
    * feature pipeline runs before accepting a new data drop. ECDFs are
    * cumulative windows over the HISTOGRAM (one row per distinct cent),
    * not raw events, so the window input is value-domain-bounded. */
  def qKsTest(s: SparkSession, dir: String): DataFrame = {
    val g = pairHist(s, dir)
    val w = Window.partitionBy("tt").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("f1", sum("g1").over(w))
      .withColumn("f2", sum("g2").over(w))
    val tot = g.groupBy("tt")
      .agg(sum("g1").as("n1"), sum("g2").as("n2"))
    orderedAll(cum.join(broadcast(tot), "tt")
      .groupBy("tt", "n1", "n2")
      .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .as("d_num"))
      .withColumn("d_bp", expr("d_num * 10000 div (n1 * n2)"))
      .select("tt", "n1", "n2", "d_num", "d_bp"))
  }

  /** Mann–Whitney rank-sum: for each non-view type vs 'view', the exact
    * doubled U statistic (2U avoids the ½ of tied average ranks:
    * 2·rank_avg at a tied cents value = 2·cum_before + m + 1) and the
    * rank-biserial AUC in basis points — the non-parametric A/B test for
    * skewed metrics where the t-test's mean is meaningless. Rides the
    * same histogram + one exclusive-prefix window. */
  def qMannwhitney(s: SparkSession, dir: String): DataFrame = {
    val g = pairHist(s, dir).withColumn("m", col("g1") + col("g2"))
    val w = Window.partitionBy("tt").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("before", coalesce(sum("m").over(w), lit(0L)))
      // Σ over treatment elements at this cents of twice their average
      // rank in the combined sample.
      .withColumn("r2part",
        col("g1") * (lit(2L) * col("before") + col("m") + lit(1L)))
    orderedAll(r.groupBy("tt")
      .agg(sum("g1").as("n1"), sum("g2").as("n2"),
        sum("r2part").as("r1_2x"))
      .withColumn("u2x", expr("r1_2x - n1 * (n1 + 1)"))
      .withColumn("auc_bp", expr("u2x * 10000 div (2 * n1 * n2)"))
      .select("tt", "n1", "n2", "u2x", "auc_bp"))
  }

  /** Deterministic Poisson-ish bootstrap CI of the per-type mean value:
    * 32 replicates, each event's replicate weight drawn from a Poisson(1)
    * lookup table over an md5-derived uniform (portable to the oracle
    * bit-for-bit), replicate mean = exact cents ratio, CI = 2nd / 31st
    * ordered replicate means — the error bar a metrics pipeline attaches
    * to every aggregate without a second pass over the data. The
    * replicate axis is an in-row explode (32×), and each replicate mean
    * map-combines; nothing is ever resampled row-by-row on a driver. */
  def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val reps = t(s, dir, "events")
      .select(col("event_type"), col("event_id"), cents.as("cents"))
      .select(col("event_type"), col("event_id"), col("cents"),
        explode(expr("sequence(0, 31)")).as("b"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat(CAST(event_id AS STRING), ':', " +
          "CAST(b AS STRING), ':bs')), 1, 6), 16, 10) AS BIGINT) % 1000"))
      // Poisson(1) pmf thresholds ×1000: P(0)=.368, P(1)=.368, P(2)=.184,
      // P(3)=.061, tail mass → 4.
      .withColumn("w", expr(
        "CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1 " +
          "WHEN h < 920 THEN 2 WHEN h < 981 THEN 3 ELSE 4 END"))
    val means = reps.groupBy("event_type", "b")
      .agg(sum(col("w") * col("cents")).as("swv"), sum("w").as("sw"))
      .filter(col("sw") > 0)
      .withColumn("mean_c",
        col("swv").cast("double") / col("sw").cast("double"))
    val rw = Window.partitionBy("event_type")
      .orderBy(col("mean_c").asc, col("b").asc)
    val ranked = means.withColumn("rn", row_number().over(rw))
    val ci = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_reps"),
        round(min(when(col("rn") === 2, col("mean_c"))), 4).as("lo_c"),
        round(min(when(col("rn") === 31, col("mean_c"))), 4).as("hi_c"))
    val pt = t(s, dir, "events")
      .select(col("event_type"), cents.as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("cents").cast("double") / count(lit(1)), 4).as("est_c"))
    orderedAll(pt.join(ci, "event_type")
      .select("event_type", "n", "est_c", "n_reps", "lo_c", "hi_c"))
  }

  /** Stratified treatment-effect estimate: treatment = parity of the
    * JSON props key `k`, outcome = cents, strata = event_type. Per
    * stratum the effect is the exact millicent integer
    * ⌊(sum_t·n_c − sum_c·n_t)·1000 / (n_t·n_c)⌋; the 'ALL' row is the
    * stratum-size-weighted ATE, composed entirely from the per-stratum
    * integers so addition order can never flap a float. One scan, one
    * 5-key aggregate — the experiment readout shape. */
  def qAteStratified(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("tr",
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 2"))
      .select(col("event_type"), col("tr"), cents.as("cents"))
    val per = e.groupBy("event_type")
      .agg(sum(when(col("tr") === 1, lit(1L)).otherwise(lit(0L)))
          .as("n_t"),
        sum(when(col("tr") === 0, lit(1L)).otherwise(lit(0L))).as("n_c"),
        sum(when(col("tr") === 1, col("cents")).otherwise(lit(0L)))
          .as("s_t"),
        sum(when(col("tr") === 0, col("cents")).otherwise(lit(0L)))
          .as("s_c"))
      .withColumn("diff_mc",
        expr("(s_t * n_c - s_c * n_t) * 1000 div (n_t * n_c)"))
    val overall = per
      .agg(sum("n_t").as("n_t"), sum("n_c").as("n_c"),
        sum(expr("(n_t + n_c) * diff_mc")).as("wsum"))
      .select(lit("ALL").as("event_type"), col("n_t"), col("n_c"),
        expr("wsum div (n_t + n_c)").as("diff_mc"))
    orderedAll(per.select("event_type", "n_t", "n_c", "diff_mc")
      .union(overall))
  }

  /** Empirical-Bayes shrinkage of per-user mean value toward the global
    * mean with prior strength k = 10: shrunk mean =
    * (sum_u·N + k·S) / (N·(n_u + k)) in exact millicents — the smoothing
    * every per-source / per-user quality score needs before it can rank
    * small groups. Global (S, N) is a 1-row broadcast; the user aggregate
    * map-combines. */
  def qEbShrinkage(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), cents.as("cents"))
    val g = e.agg(sum("cents").as("gs"), count(lit(1)).as("gn"))
    orderedAll(e.groupBy("user_id")
      .agg(sum("cents").as("us"), count(lit(1)).as("un"))
      .crossJoin(broadcast(g))
      .withColumn("raw_mc", expr("us * 1000 div un"))
      .withColumn("shrunk_mc",
        expr("(us * gn + 10 * gs) * 1000 div (gn * (un + 10))"))
      .select(col("user_id"), col("un").as("n"), col("raw_mc"),
        col("shrunk_mc")))
  }

  /** Ordinal SAX symbolization of each user's event-value series: events
    * in (epoch_us, event_id) order split into 4 equal-count segments
    * (ntile), each segment's mean ranked against the user's other
    * segments, rank → letter a..d, concatenated in segment order — the
    * shape signature that lets a 100 TB behavioral store group users by
    * trajectory with a GROUP BY instead of a time-series library. Two
    * user-partitioned windows + one user aggregate; users are the
    * sharding axis. Segment means compare as exact integer ratios cast
    * to double (bit-identical both engines); rank ties break by segment
    * index. */
  def qSaxSymbols(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), expr("CAST(unix_micros(ts) AS BIGINT)")
        .as("us"), col("event_id"), cents.as("cents"))
    val wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    val seg = e.withColumn("seg", ntile(4).over(wo))
      .groupBy("user_id", "seg")
      .agg(sum("cents").as("ss"), count(lit(1)).as("sn"))
      .withColumn("mean_c",
        col("ss").cast("double") / col("sn").cast("double"))
    val wr = Window.partitionBy("user_id")
      .orderBy(col("mean_c").asc, col("seg").asc)
    orderedAll(seg
      .withColumn("r", row_number().over(wr))
      .withColumn("letter", expr("char(96 + r)"))
      .groupBy("user_id")
      .agg(sum("sn").cast("long").as("n_events"),
        expr("concat_ws('', transform(array_sort(" +
          "collect_list(struct(seg, letter))), x -> x.letter))")
          .as("sax")))
  }

  /** Kaplan–Meier time-to-conversion (§2.37): per user, duration in days
    * from first signup to first subsequent purchase (event) or to the
    * global horizon (censored); per distinct duration day, the at-risk
    * count, events, censorings, and the CUMULATIVE log-survival in exact
    * ×10⁶-quantized units (each day's ln((n−d)/n) rounds to a BIGINT
    * BEFORE the cumulative sum — the zipf/dsir policy — so S(t) =
    * exp(ls_micro/10⁶) is reconstructible and no float ever crosses an
    * aggregate; the one S = 0 corner emits NULL and is skipped by the
    * window sum in both engines). Survival analysis is how a pipeline
    * reads conversion/churn without waiting for every user to finish.
    * Scale shape: two user-keyed aggregates, a ≤ |days| day table, and
    * day-ordered windows over it — the corpus never crosses one
    * partition. */
  def qSurvival(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_type"),
      expr("CAST(unix_micros(ts) AS BIGINT)").as("us"))
    val t0 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("us").as("t0"))
    val tp = e.filter(col("event_type") === "purchase")
      .join(t0, "user_id").filter(col("us") >= col("t0"))
      .groupBy("user_id").agg(min("us").as("tp"))
    val hz = e.agg(max("us").as("hz"))
    val dur = t0.join(tp, Seq("user_id"), "left")
      .crossJoin(broadcast(hz))
      .select(col("user_id"),
        expr("CAST(coalesce(tp, hz) - t0 AS BIGINT) div 86400000000")
          .as("day"),
        col("tp").isNotNull.as("converted"))
    val days = dur.groupBy("day")
      .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("d"),
        sum(when(col("converted"), 0L).otherwise(1L)).as("c"))
    val wB = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wC = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedAll(days
      .crossJoin(broadcast(dur.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wB),
          lit(0L)))
      .withColumn("term_u", expr(
        "CASE WHEN d > 0 AND n_risk > d THEN CAST(round(ln(" +
          "CAST(n_risk - d AS DOUBLE) / n_risk) * 1000000) AS BIGINT) " +
          "END"))
      .withColumn("ls_micro", sum("term_u").over(wC))
      .select("day", "n_risk", "d", "c", "ls_micro"))
  }

  /** Hill tail-index estimator (§2.37): per event type, over the top
    * k = 100 order statistics of cents (ref = the 101st), the
    * ×10⁶-quantized Σ ln(x_i/x_ref) and its mean — the number that says
    * whether a metric's tail is heavy enough (α ≲ 2) that means/CIs are
    * lies and the pipeline must switch to quantile readouts. One
    * type-keyed rank window (TopK-pruned) + one mergeable aggregate. */
  def qHillTail(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), col("event_id"), cents.as("cents"))
      .filter(col("cents") > 0)
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("event_id").asc)
    val top = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 101)
    val ref = top.filter(col("rn") === 101)
      .select(col("event_type"), col("cents").as("ref_cents"))
    orderedAll(top.filter(col("rn") <= 100)
      .join(broadcast(ref), "event_type")
      .withColumn("term_u", expr(
        "CAST(round(ln(CAST(cents AS DOUBLE) / ref_cents) * 1000000) " +
          "AS BIGINT)"))
      .groupBy("event_type", "ref_cents")
      .agg(count(lit(1)).as("k"), sum("term_u").as("hill_sum_u"))
      .withColumn("inv_alpha_u", expr("hill_sum_u div k"))
      .select("event_type", "k", "ref_cents", "hill_sum_u",
        "inv_alpha_u"))
  }

  /** Two-sample Anderson–Darling (§2.111): purchase vs view daily
    * revenue — the TAIL-WEIGHTED sibling of [[qKsTest]] (KS sees only
    * the single largest ECDF gap, near the middle by construction; AD
    * integrates the squared gap with 1/(F(1−F)) weight, so tail
    * divergence actually registers — the test a revenue-distribution
    * drift gate wants). Pettitt's exact form over the pooled order:
    * A² = (1/(m·n)) Σ_{j=1}^{N−1} (M_j·N − j·m)² / (j·(N−j)), with
    * the pooled order made TOTAL by (cents, day, tag) — the day-spine
    * tie policy, declared — so no tie-adjustment term is needed. Each
    * term floors to µ-units through DECIMAL(38,0) (qAnova idiom,
    * ≤1 µ error per term identical in both engines) and the final
    * A²·10⁶ is ONE exact integer division — no double anywhere. The
    * only unpartitioned window runs over the aggregated day spine
    * (the documented exemption class). */
  def qAndersonDarling(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "day")
      .agg(sum("cents").cast("long").as("x"))
      .withColumn("tag",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    val ord = Window.orderBy(col("x").asc, col("day").asc,
      col("tag").asc)
    val tot = daily.agg(sum("tag").cast("long").as("m"),
      count(lit(1)).as("nn"))
    orderedAll(daily
      .withColumn("j", row_number().over(ord).cast("long"))
      .withColumn("mj", sum("tag").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .filter(col("j") < col("nn"))
      .withColumn("term_u", expr(
        "(CAST(mj * nn - j * m AS DECIMAL(38,0)) * (mj * nn - j * m) " +
          "* 1000000) div (j * (nn - j))"))
      .groupBy("m", "nn")
      .agg(sum("term_u").as("t_u"))
      .selectExpr("m AS n_purchase", "nn - m AS n_view",
        "CAST(t_u div (m * (nn - m)) AS BIGINT) AS a2_micro"))
  }

  /** Gumbel extreme-value fit (§2.110): per event type, method-of-
    * moments Gumbel(µ, β) parameters over the MONTHLY MAXIMA of daily
    * revenue — the block-maxima EVT recipe behind "what daily peak
    * should capacity planning expect per month" (β = s·√6/π,
    * µ = m̄ − γβ). The block maxima and their first two moments are
    * EXACT integers (cents day spine → 30-day block max → DECIMAL
    * square sums), so the terminal double chain (one sqrt, two mults,
    * one subtract against Euler–Mascheroni) is identical in both
    * engines; β is irrational (a sqrt), making the milli rounds
    * boundary-safe — except when the maxima are constant (variance 0
    * ⇒ β = 0, µ rational): that degenerate fit emits NULL, declared.
    * Two mergeable aggregates on the |days| spine — never raw events
    * past the first fold. */
  def qGumbelFit(s: SparkSession, dir: String): DataFrame = {
    val maxima = t(s, dir, "events")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "day")
      .agg(sum("cents").cast("long").as("x"))
      .withColumn("blk", expr("day div 30"))
      .groupBy("event_type", "blk").agg(max("x").as("m"))
    orderedAll(maxima.groupBy("event_type")
      .agg(count(lit(1)).as("n_blocks"),
        sum("m").cast("long").as("s"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("ss"))
      .withColumn("beta_milli", expr(
        "CASE WHEN n_blocks < 2 OR n_blocks * ss = " +
          "CAST(s AS DECIMAL(38,0)) * s THEN NULL ELSE " +
          "CAST(round(sqrt(CAST(n_blocks * ss - " +
          "CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / " +
          "(CAST(n_blocks AS DOUBLE) * (n_blocks - 1))) " +
          "* sqrt(6) / pi() * 1000) AS BIGINT) END"))
      .withColumn("mu_milli", expr(
        "CASE WHEN beta_milli IS NULL THEN NULL ELSE " +
          "CAST(round((CAST(s AS DOUBLE) / n_blocks - " +
          "0.5772156649015329 * (sqrt(CAST(n_blocks * ss - " +
          "CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / " +
          "(CAST(n_blocks AS DOUBLE) * (n_blocks - 1))) " +
          "* sqrt(6) / pi())) * 1000) AS BIGINT) END"))
      .select("event_type", "n_blocks", "beta_milli", "mu_milli"))
  }
}
