package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 cross-modal alignment audits (SURVEY §2.72): embedding
  * coverage of the document corpus (which sources are missing vectors
  * — the join every retrieval pipeline silently assumes), the
  * length↔norm correlation across the modality join (the sanity check
  * that embeddings actually respond to content), and class-
  * conditional norm moments (per-label embedding health). Norms ride
  * the ×10⁴ integer lane policy; correlations are exact-moment
  * integer numerators with one final sqrt. */
object CrossModal {

  /** Quantized L2 norm ×10⁴ of the embedding (exact integer per row:
    * sqrt of the exact integer lane-square sum, rounded once). */
  private def normU: org.apache.spark.sql.Column = expr(
    "CAST(round(sqrt(CAST(aggregate(transform(embedding, " +
      "v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)), " +
      "CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS DOUBLE))) " +
      "AS BIGINT)")

  /** Embedding coverage (§2.72): per document source, how many docs
    * have a same-id embedding row, coverage bp — the alignment audit
    * before any retrieval join. Left join on the id key with the
    * embedding side projected to its key column only. */
  def qEmbedCoverage(s: SparkSession, dir: String): DataFrame = {
    val ids = t(s, dir, "embeddings").select(col("vec_id"))
    orderedAll(t(s, dir, "documents")
      .join(ids, col("doc_id") === col("vec_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_embedded"))
      .withColumn("coverage_bp", expr("n_embedded * 10000 div n_docs")))
  }

  /** Length↔norm correlation (§2.72): Pearson r (milli) between
    * n_chars and the quantized embedding norm over the aligned rows —
    * near-zero is EXPECTED for normalized embeddings; a large |r|
    * flags length leaking into the geometry. Exact integer moments;
    * one sqrt division. */
  def qLenNormCorr(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "documents")
      .join(t(s, dir, "embeddings").select(col("vec_id"),
        normU.as("nu")), col("doc_id") === col("vec_id"))
      .select(col("n_chars").as("x"), col("nu").as("y"))
    orderedAll(joined.agg(
      count(lit(1)).as("n"),
      sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
      sum(expr("x * x")).cast("long").as("qx"),
      sum(expr("y * y")).cast("long").as("qy"),
      sum(expr("x * y")).cast("long").as("sxy"))
      .withColumn("corr_milli", expr(
        "CASE WHEN n * qx - sx * sx = 0 OR n * qy - sy * sy = 0 " +
          "THEN NULL ELSE CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)" +
          " * 1000 / sqrt(CAST(n * qx - sx * sx AS DOUBLE) * " +
          "CAST(n * qy - sy * sy AS DOUBLE))) AS BIGINT) END"))
      .select("n", "corr_milli"))
  }

  /** Class-conditional norm moments (§2.72): per label, n and the
    * quantized-norm mean (milli) and variance (the q_embed_variance
    * arithmetic on the norm axis) — a label whose norms drift flags a
    * collection problem before any classifier sees it. One mergeable
    * aggregate. */
  def qNormByLabel(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"), normU.as("nu"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum("nu").cast("long").as("s_u"),
        sum(expr("nu * nu")).cast("long").as("q_u"))
      .withColumn("mean_milli", expr("s_u * 1000 div n"))
      .withColumn("var_u", expr(
        "(CAST(n AS DECIMAL(38,0)) * q_u - " +
          "CAST(s_u AS DECIMAL(38,0)) * s_u) div " +
          "(CAST(n AS DECIMAL(38,0)) * n)")
        .cast("long"))
      .select("label", "n", "mean_milli", "var_u"))
}
