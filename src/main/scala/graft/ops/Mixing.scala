package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 data-mixing policy (SURVEY §2.91): temperature-weighted
  * source sampling — the pretraining-mix staple (w_s ∝ n_s^τ): per-τ
  * source shares, the mixture's entropy (how much diversity each
  * temperature buys), and the epoch plan a token budget implies for
  * each source under the τ = 0.7 mix (the "small sources repeat"
  * readout).
  *
  * Determinism: the only transcendentals (exp/ln on doubles) are
  * ×10³/×10⁶-quantized to BIGINT per SOURCE ROW before any sum — the
  * q_ngram_lm convention (IEEE-identical in both engines); everything
  * downstream is exact integer arithmetic. Sources collapse to one
  * mergeable token-count aggregate first; the τ axis is 3 literal rows.
  */
object Mixing {

  /** (source, n_docs, n_tokens) — occurrence tokens, q_wordcount's
    * universe. */
  private def srcTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), size(tokens(col("text"))).cast("long")
        .as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").cast("long")
        .as("n_tokens"))

  /** Quantized temperature weight: round(n_tokens^(τ/1000) · 1000) —
    * the per-row transcendental, BIGINT thereafter. */
  private def wExpr(tauMilli: Int): String =
    s"CAST(round(exp(ln(CAST(n_tokens AS DOUBLE)) * $tauMilli / 1000.0)" +
      s" * 1000) AS BIGINT)"

  /** Temperature mix (§2.91): per (τ ∈ {0.5, 0.7, 1.0}, source), the
    * quantized weight and the sampling share in bp — τ = 1 is
    * proportional, lower τ up-weights small sources. */
  def qTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val st = srcTokens(s, dir)
    val perTau = Seq(500, 700, 1000).map { tau =>
      st.withColumn("tau_milli", lit(tau.toLong))
        .withColumn("w_u", expr(wExpr(tau)))
    }.reduce(_ unionAll _)
    val tot = perTau.groupBy(col("tau_milli").as("t2"))
      .agg(sum("w_u").cast("long").as("w_tot"))
    orderedAll(perTau
      .join(broadcast(tot), col("tau_milli") === col("t2"))
      .withColumn("share_bp", expr("w_u * 10000 div w_tot"))
      .select("tau_milli", "source", "n_docs", "n_tokens", "w_u",
        "share_bp"))
  }

  /** Mixture entropy (§2.91): per τ, the Shannon entropy of the
    * bp-quantized share vector in micro-nats — H = −Σ p·ln(p) with
    * p = share_bp/10⁴ and the ln term ×10⁶-quantized per source; zero
    * shares contribute zero (lim p·ln p = 0). Higher τ concentrates on
    * big sources → lower H; the number that prices the diversity-vs-
    * distribution-match trade. */
  def qMixEntropy(s: SparkSession, dir: String): DataFrame = {
    val st = srcTokens(s, dir)
    val perTau = Seq(500, 700, 1000).map { tau =>
      st.withColumn("tau_milli", lit(tau.toLong))
        .withColumn("w_u", expr(wExpr(tau)))
    }.reduce(_ unionAll _)
    val tot = perTau.groupBy(col("tau_milli").as("t2"))
      .agg(sum("w_u").cast("long").as("w_tot"),
        count(lit(1)).as("n_sources"))
    orderedAll(perTau
      .join(broadcast(tot), col("tau_milli") === col("t2"))
      .withColumn("share_bp", expr("w_u * 10000 div w_tot"))
      .withColumn("term_u", expr(
        "CASE WHEN share_bp = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "share_bp * -CAST(round(ln(CAST(share_bp AS DOUBLE) / 10000.0)" +
          " * 1000000) AS BIGINT) END"))
      .groupBy("tau_milli")
      .agg(max("n_sources").as("n_sources"),
        expr("CAST(sum(term_u) div 10000 AS BIGINT)")
          .as("entropy_micro_nats")))
  }

  /** Epoch plan (§2.91): under a 10⁶-token budget allocated by the
    * τ = 0.7 mix, each source's token allocation and implied epochs in
    * milli (alloc/n_tokens — > 1000 means the source repeats). The
    * capacity-planning readout behind q_token_budget. */
  def qEpochPlan(s: SparkSession, dir: String): DataFrame = {
    val st = srcTokens(s, dir).withColumn("w_u", expr(wExpr(700)))
    val tot = st.agg(sum("w_u").cast("long").as("w_tot"))
    orderedAll(st.crossJoin(broadcast(tot))
      .withColumn("alloc_tokens", expr(
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * w_u div w_tot AS BIGINT)"))
      .withColumn("epochs_milli", expr(
        "alloc_tokens * 1000 div n_tokens"))
      .select("source", "n_tokens", "w_u", "alloc_tokens",
        "epochs_milli"))
  }
}
