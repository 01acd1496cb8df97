package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 corpus / dataset profile readouts (SURVEY §2.60): the
  * duplicate-cluster size histogram (the report a dedup run is judged
  * by), per-dimension embedding variance (the PCA/whitening precheck),
  * and the order-size profile (how many lines a basket carries, and
  * where the revenue sits). All-integer outputs; every query collapses
  * facts to a bounded profile axis in one or two mergeable aggregates. */
object Profiles {

  /** Duplicate-cluster size profile (§2.60): group documents by exact
    * text, then histogram the cluster sizes — per size k: cluster
    * count, docs covered, redundant docs (k−1 each), and the corpus
    * share in basis points. The "what did dedup buy" report behind
    * q_dedup_exact (which lists texts) and q_dup_ratio (which prices
    * sources). Two mergeable aggregates on the text → size axes; the
    * corpus total rides a broadcast row. */
  def qDupProfile(s: SparkSession, dir: String): DataFrame = {
    val sizes = t(s, dir, "documents")
      .groupBy("text").agg(count(lit(1)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_clusters"))
    val tot = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    orderedAll(sizes.crossJoin(broadcast(tot))
      .withColumn("docs", expr("k * n_clusters"))
      .withColumn("redundant", expr("(k - 1) * n_clusters"))
      .withColumn("share_bp", expr("k * n_clusters * 10000 div n_docs"))
      .select("k", "n_clusters", "docs", "redundant", "share_bp"))
  }

  /** Per-dimension embedding variance (§2.60): coordinates quantized
    * ×10⁴ (the q_confusion lane policy), then per position 1..64 the
    * exact integer count/sum/sum-of-squares and the variance in
    * 10⁻⁸ units via (n·q − s²) div n² — the flat-dimension detector a
    * PCA/whitening or product-quantization step runs first. One
    * posexplode + one mergeable aggregate; squares ride DECIMAL(38,0)
    * (HUGEINT in DuckDB) clear of the 64-bit rim. */
  def qEmbedVariance(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "embeddings")
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("pos"),
        expr("CAST(round(CAST(col AS DOUBLE) * 10000) AS BIGINT)")
          .as("x_u"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum("x_u").cast("long").as("s_u"),
        sum(expr("x_u * x_u")).cast("long").as("q_u"))
      .withColumn("var_cu", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * q_u - " +
          "CAST(s_u AS DECIMAL(38,0)) * s_u) div " +
          "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .select("pos", "n", "s_u", "q_u", "var_cu"))

  /** Effective rank of the embedding space (§2.111) — the participation
    * ratio PR = (Σ_d v_d)² / Σ_d v_d² over the 64 per-dimension
    * variances (the diagonal proxy for the eigenvalue PR; equal to it
    * when dimensions are uncorrelated, which q_dim_corr audits): the
    * single-number "dimensional collapse" diagnostic next to
    * [[qEmbedVariance]]'s per-dim listing — PR ≈ 64 says every
    * dimension carries signal, PR ≈ 1 says the space collapsed onto
    * one axis. Variances are [[qEmbedVariance]]'s exact centi-µ²
    * integers, and PR·1000 is ONE exact integer division — a rational
    * of exact integers must never pass through round() (.5-flap), so
    * the div spelling is load-bearing. */
  def qEffectiveRank(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "embeddings")
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("pos"),
        expr("CAST(round(CAST(col AS DOUBLE) * 10000) AS BIGINT)")
          .as("x_u"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum("x_u").cast("long").as("s_u"),
        sum(expr("x_u * x_u")).cast("long").as("q_u"))
      .withColumn("var_cu", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * q_u - " +
          "CAST(s_u AS DECIMAL(38,0)) * s_u) div " +
          "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
    orderedAll(v.agg(
      count(lit(1)).as("dims"),
      sum("var_cu").cast("long").as("var_sum_cu"),
      sum(expr("CAST(var_cu AS DECIMAL(38,0)) * var_cu")).as("var_sq"))
      .withColumn("pr_milli", expr(
        "CASE WHEN var_sq = 0 THEN NULL ELSE " +
          "CAST(CAST(var_sum_cu AS DECIMAL(38,0)) * var_sum_cu * 1000 " +
          "div var_sq AS BIGINT) END"))
      .select("dims", "var_sum_cu", "pr_milli"))
  }

  /** Order-size profile (§2.60): per basket line-count k, how many
    * orders carry k lines and how much exact-cents revenue they hold,
    * with the revenue share in basis points — the basket-shape readout
    * a picker/pricing model starts from. Facts collapse to per-order
    * (k, cents) partials in one mergeable aggregate; the k axis is
    * ≤ max-lines wide. */
  def qOrderProfile(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("k"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("cents"))
    val tot = per.agg(sum("cents").cast("long").as("tot"))
    orderedAll(per.groupBy("k")
      .agg(count(lit(1)).as("n_orders"),
        sum("cents").cast("long").as("rev_cents"))
      .crossJoin(broadcast(tot))
      .withColumn("rev_share_bp", expr("rev_cents * 10000 div tot"))
      .select("k", "n_orders", "rev_cents", "rev_share_bp"))
  }
}
