package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 experiment-design audits (SURVEY §2.65): the minimum
  * detectable effect / required-sample-size table (what this traffic
  * can actually measure, BEFORE the test runs), Cohen's d effect size
  * on the pre/post split (was the shift big or just significant?), and
  * the pre/post variance ratio (the equal-variance assumption check
  * under the pooled-sd tests). All are ONE conditional-aggregate scan
  * over exact cents moments (the q_abtest shape); doubles appear only
  * in the final sqrt/ratio expressions, spelled identically in both
  * engines. z-constants ride exact ×10⁴ integer literals. */
object Power {

  /** Shared per-type pre/post cents moments. */
  private def moments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("pre",
        col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type")
      .agg(
        sum(when(col("pre"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("pre"), 0L).otherwise(1L)).cast("long").as("n2"),
        sum(when(col("pre"), col("cents")).otherwise(0L)).cast("long")
          .as("s1"),
        sum(when(col("pre"), lit(0L)).otherwise(col("cents")))
          .cast("long").as("s2"),
        sum(when(col("pre"), expr("cents * cents")).otherwise(0L))
          .cast("long").as("q1"),
        sum(when(col("pre"), lit(0L)).otherwise(expr("cents * cents")))
          .cast("long").as("q2"))

  /** MDE / required-n (§2.65): per event type, the pooled sd (cents,
    * milli), the minimum detectable effect in cents-milli at α=5%,
    * power=80% (z_{α/2}+z_β = 2.8016, embedded ×10⁴), and the per-arm
    * n required to detect a 5%-of-pooled-mean effect —
    * n = 2·((z·sd)/Δ)². The "is this experiment even worth running"
    * table. */
  def qPowerMde(s: SparkSession, dir: String): DataFrame =
    orderedAll(moments(s, dir)
      .withColumn("sd_milli", expr(
        "CAST(round(sqrt((CAST(q1 + q2 AS DOUBLE) * (n1 + n2) " +
          "- CAST(s1 + s2 AS DOUBLE) * (s1 + s2)) / " +
          "(CAST(n1 + n2 AS DOUBLE) * (n1 + n2))) * 1000) AS BIGINT)"))
      .withColumn("mde_milli", expr(
        "CAST(round(28016 * CAST(sd_milli AS DOUBLE) / 10000 * " +
          "sqrt(2.0 / least(n1, n2))) AS BIGINT)"))
      .withColumn("req_n_per_arm", expr(
        "CASE WHEN s1 + s2 = 0 THEN NULL ELSE " +
          "CAST(ceil(2.0 * pow(28016.0 / 10000 * sd_milli / " +
          "(0.05 * (CAST(s1 + s2 AS DOUBLE) * 1000 / (n1 + n2))), 2)) " +
          "AS BIGINT) END"))
      .select("event_type", "n1", "n2", "sd_milli", "mde_milli",
        "req_n_per_arm"))

  /** Cohen's d (§2.65): per event type, the standardized pre→post
    * mean shift in milli-sd units — d = (m2 − m1)/sd_pooled with the
    * classic (n−1)-denominator pooled sd. Sign-safe by construction:
    * the ratio is ONE double division rounded once. */
  def qCohensD(s: SparkSession, dir: String): DataFrame =
    orderedAll(moments(s, dir)
      .withColumn("d_milli", expr(
        "CASE WHEN n1 < 2 OR n2 < 2 THEN NULL ELSE " +
          "CAST(round((CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) " +
          "/ n1) * 1000 / sqrt(" +
          "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) + " +
          "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)) / " +
          "(n1 + n2 - 2))) AS BIGINT) END"))
      .select("event_type", "n1", "n2", "d_milli"))

  /** Welch's two-sample t (§2.112): per event type, the unequal-variance
    * t statistic on the pre/post split — t = (m₂−m₁)/√(v₁/n₁+v₂/n₂) with
    * (n−1)-denominator sample variances — plus the Welch–Satterthwaite
    * effective degrees of freedom. The staple the §2.65 trio circles
    * (Cohen's d sizes the shift, the variance ratio checks the pooled
    * assumption; Welch is the test you actually run when that check
    * fails). Same one-scan exact-cents-moments shape: integers until the
    * final expressions, each ONE double formula spelled identically in
    * both engines, rounded once to milli/deci. */
  def qWelchTtest(s: SparkSession, dir: String): DataFrame =
    orderedAll(moments(s, dir)
      .withColumn("se1", expr(
        "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1"))
      .withColumn("se2", expr(
        "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2"))
      .withColumn("t_milli", expr(
        "CASE WHEN n1 < 2 OR n2 < 2 OR se1 + se2 = 0.0 THEN NULL ELSE " +
          "CAST(round((CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1)" +
          " * 1000 / sqrt(se1 + se2)) AS BIGINT) END"))
      .withColumn("df_deci", expr(
        "CASE WHEN n1 < 2 OR n2 < 2 OR se1 + se2 = 0.0 THEN NULL ELSE " +
          "CAST(round((se1 + se2) * (se1 + se2) * 10 / " +
          "(se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))) AS BIGINT) END"))
      .select("event_type", "n1", "n2", "t_milli", "df_deci"))

  /** Variance ratio (§2.65): per event type, var_post/var_pre in
    * milli — the equal-variance assumption check before trusting a
    * pooled-sd test (rule of thumb: outside [0.5, 2] the pooled test
    * is suspect). Sample variances with the (n−1) denominator; the
    * ratio is one double division. */
  def qVarianceRatio(s: SparkSession, dir: String): DataFrame =
    orderedAll(moments(s, dir)
      .withColumn("ratio_milli", expr(
        "CASE WHEN n1 < 2 OR n2 < 2 OR " +
          "CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1 = 0.0 " +
          "THEN NULL ELSE " +
          "CAST(round(((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 " +
          "/ n2) / (n2 - 1)) * 1000 / " +
          "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / " +
          "(n1 - 1))) AS BIGINT) END"))
      .select("event_type", "n1", "n2", "ratio_milli"))
}
