package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 §2.31 corpus-linguistics extensions: per-source readability
  * profiling, keyword-in-context (KWIC) concordance, and per-source
  * discriminative-token extraction (the naive-Bayes feature-selection
  * statistic). All DuckDB-oracled; all arithmetic is integer (counts,
  * lengths, and non-negative integer divisions).
  *
  * Scale shape: everything here is scan → in-row array/regex work →
  * mergeable aggregate; the only joins are against vocabulary- or
  * source-sized aggregates (broadcast). Documents shard arbitrarily, so
  * every pipeline parallelizes to any partition count.
  */
object Linguistics {

  /** Per-source readability profile: document, word, syllable (vowel-run
    * approximation), and letter counts, plus syllables-per-word and
    * word-length ratios ×100 — the Flesch-style signal set over a corpus
    * with no sentence punctuation. All extraction is in-row regex/array
    * work feeding one mergeable aggregate. */
  def qReadability(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .select(col("source"),
        expr("CAST(size(filter(split(lower(text), ' '), x -> x != '')) " +
          "AS BIGINT)").as("words"),
        expr("CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) " +
          "AS BIGINT)").as("sylls"),
        expr("CAST(length(replace(text, ' ', '')) AS BIGINT)").as("chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("words").as("n_words"),
        sum("sylls").as("n_sylls"),
        sum("chars").as("n_chars"))
      .withColumn("spw_x100", expr("n_sylls * 100 div n_words"))
      .withColumn("wlen_x100", expr("n_chars * 100 div n_words")))

  /** KWIC concordance for the corpus keyword `join`: every occurrence
    * position (1-based) with up to two tokens of left/right context —
    * the corpus-inspection primitive behind every "show me usages"
    * tool. Positions index the RAW space-split sequence so both engines
    * agree byte-for-byte; context windows clamp at document edges.
    * posexplode + two in-row slices — no join anywhere. */
  def qConcordance(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("idx", "tok")))
      .filter(col("tok") === "join")
      .withColumn("pos", (col("idx") + 1).cast("long"))
      .select(col("doc_id"), col("pos"),
        expr("array_join(slice(toks, greatest(1, pos - 2), " +
          "least(2, pos - 1)), ' ')").as("left_ctx"),
        expr("array_join(slice(toks, pos + 1, 2), ' ')").as("right_ctx")))

  /** Discriminative tokens per source (naive-Bayes lift): for each
    * (source, token) with ≥ 5 occurrences, lift = P(token|source) /
    * P(token) in exact basis points — n_st·N·10⁴ div (n_t·n_s) — and
    * the top 5 per source under the unique (lift desc, token) order.
    * Token marginals are vocabulary-sized (broadcast); the corpus total
    * is one row. */
  def qNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    val st = t(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("n_st"))
    val nt = st.groupBy("token").agg(sum("n_st").as("n_t"))
    val ns = st.groupBy("source").agg(sum("n_st").as("n_s"))
    val tot = st.agg(sum("n_st").as("n_tot"))
    val w = Window.partitionBy("source")
      .orderBy(col("lift_bp").desc, col("token").asc)
    orderedAll(st.filter(col("n_st") >= 5)
      .join(broadcast(nt), "token")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .withColumn("lift_bp",
        expr("n_st * n_tot * 10000 div (n_t * n_s)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("source", "token", "n_st", "lift_bp", "rank"))
  }
}
