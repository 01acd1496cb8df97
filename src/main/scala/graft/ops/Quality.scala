package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 corpus-quality extensions (SURVEY §2.21): code-vs-prose
  * detection, the C4-style filter-cascade rejection accounting, shingle
  * novelty (the "how much of this doc is new" signal), per-source
  * duplicate-rate accounting, and URL canonicalization — the measurement
  * rim of a web-corpus curation pipeline. All DuckDB-oracled; every query
  * is scan + mergeable aggregates (at most one extra text- or
  * shingle-keyed shuffle), integer or round(…,4) emitted values only.
  *
  * Where the fixture text is too clean to exercise a detector (it is
  * lowercase words + spaces), the query derives a deterministic noisy
  * form in-row from (doc_id, text) — the established Curation.scala
  * pattern: the regex/accounting machinery is the real, portable part,
  * and both engines see identical inputs. */
object Quality {

  /** Code-vs-prose detection: punctuation-density heuristics over a
    * deterministically code-salted corpus (docs with doc_id ≡ 0 mod 3 get
    * a code tail — braces, brackets, semicolons; ≡ 1 mod 3 a prose tail).
    * A doc is code-like iff code-punctuation chars ≥ 2% of its length
    * (integer cross-multiplication, no float threshold). Emits per-source
    * counts + aggregate densities — the signal used to route documents to
    * code-specific pipelines. Scan + one mergeable aggregate. */
  def qCodeDetect(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .withColumn("raw", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          lit(" if (x) { y[0] = x; return y; }"))
          .when(col("doc_id") % 3 === 1, lit(" and so it goes."))
          .otherwise(lit(""))))
      .withColumn("n", length(col("raw")).cast("long"))
      .withColumn("punct",
        (length(col("raw")) -
          length(regexp_replace(col("raw"), "[{}\\[\\]();=]", "")))
          .cast("long"))
      .withColumn("is_code", col("punct") * 50 >= col("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).cast("long")
          .as("n_code"),
        sum(col("punct")).cast("long").as("punct_chars"),
        sum(col("n")).cast("long").as("total_chars")))

  /** Filter-cascade accounting (the C4/Gopher-rules shape): documents
    * flow through ordered keep-rules — minimum length, minimum token
    * count, type-token repetition — and each doc is charged to the FIRST
    * rule it fails (or 'kept'). Emits per-(source, stage) counts and the
    * share in basis points — the rejection budget report every curation
    * run ships with. Integer arithmetic throughout; the per-source total
    * rides in via one broadcast join. */
  def qFilterCascade(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "documents")
      .withColumn("toks",
        array_remove(array_distinct(tokens(col("text"))), ""))
      .withColumn("all_toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("stage",
        when(col("n_chars") < 40, lit("len"))
          .when(col("all_toks") < 8, lit("tokens"))
          .when(size(col("toks")).cast("long") * 2 < col("all_toks"),
            lit("repetition"))
          .otherwise(lit("kept")))
    val totals = staged.groupBy("source")
      .agg(count(lit(1)).as("n_total"))
    orderedAll(staged.groupBy("source", "stage")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "source")
      .withColumn("share_bp", expr("n * 10000 div n_total"))
      .select("source", "stage", "n", "share_bp"))
  }

  /** Shingle novelty: the share of each en doc's distinct bigram shingles
    * that FIRST appear in that doc (first = min doc_id over the corpus) —
    * the dedup-adjacent freshness signal used to down-weight boilerplate
    * and rank documents for training mixes. Two mergeable aggregates (the
    * shingle→min-doc map is shingle-keyed, nothing corpus-sized is
    * broadcast); novelty emitted in exact basis points. Docs with fewer
    * than two tokens have no shingles and drop out (same rule both
    * engines). */
  def qShingleNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents").filter(col("lang") === "en")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(expr(
        """filter(
          |  transform(toks, (x, i) ->
          |    CASE WHEN i < size(toks) - 1
          |         THEN concat(x, ' ', toks[i + 1]) END),
          |  b -> b IS NOT NULL)""".stripMargin)).as("shingle"))
      .distinct()
    val first = sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
    orderedAll(sh.join(first, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("novel"))
      .withColumn("novelty_bp", expr("novel * 10000 div n_shingles")))
  }

  /** Per-source duplicate accounting: how many docs are exact-text
    * duplicates within the source, and how many share their text with
    * ANOTHER source — the two numbers a mixing strategy needs before
    * weighting sources. One text-keyed aggregate joined back (exact
    * dedup's accounting twin: q_dedup_exact lists the texts, this prices
    * them). */
  def qDupRatio(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val byText = docs.groupBy("text")
      .agg(countDistinct(col("source")).as("n_sources"))
    orderedAll(docs.join(byText, "text")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("text"))).as("dup_docs"),
        sum(when(col("n_sources") >= 2, 1L).otherwise(0L)).cast("long")
          .as("xsource_docs")))
  }

  /** URL canonicalization: strip the query string and any trailing slash,
    * then count raw vs canonical URLs per host — the dedup step that runs
    * BEFORE fetch in a crawl pipeline (URL-level dedup is orders of
    * magnitude cheaper than content dedup). The derived URLs collide on
    * doc_id mod 50 by construction, so canonicalization genuinely
    * deduplicates. Scan + one mergeable aggregate. */
  def qUrlCanonical(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.com/"), col("lang"),
        lit("/doc/"), col("doc_id") % 50, lit("/?ref="), col("doc_id")))
      .withColumn("canon",
        regexp_replace(regexp_replace(col("url"), "\\?.*$", ""), "/$", ""))
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canon")).as("n_canonical"),
        (count(lit(1)) - countDistinct(col("canon"))).as("dup_urls")))

  /** Cohen's kappa inter-rater agreement (§2.57): per source, the
    * chance-corrected agreement between two deterministic document
    * raters — A flags length (n_chars ≥ the corpus median 306), B flags
    * topic (contains both 'join' and 'query' tokens). Observed and
    * chance agreement in basis points; κ in milli via the all-integer
    * identity κ = (n·n_agree − Σ margins) / (n² − Σ margins), with a
    * +1001·den offset before the division (κ·1000 ∈ [−1000, 1000], so
    * the dividend stays positive — the sign-safe div policy). One flag
    * scan + one mergeable aggregate per source. */
  def qCohensKappa(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .withColumn("ra", col("n_chars") >= 306L)
      .withColumn("toks", tokens(col("text")))
      .withColumn("rb", array_contains(col("toks"), "join") &&
        array_contains(col("toks"), "query"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).cast("long")
          .as("n_agree"),
        sum(when(col("ra"), 1L).otherwise(0L)).cast("long").as("a1"),
        sum(when(col("rb"), 1L).otherwise(0L)).cast("long").as("b1"))
      .withColumn("po_bp", expr("n_agree * 10000 div n"))
      .withColumn("pe_bp", expr(
        "(a1 * b1 + (n - a1) * (n - b1)) * 10000 div (n * n)"))
      .withColumn("kappa_milli", expr(
        "CASE WHEN n * n = a1 * b1 + (n - a1) * (n - b1) THEN NULL " +
          "ELSE ((n * n_agree - a1 * b1 - (n - a1) * (n - b1)) * 1000 " +
          "+ 1001 * (n * n - a1 * b1 - (n - a1) * (n - b1))) " +
          "div (n * n - a1 * b1 - (n - a1) * (n - b1)) - 1001 END"))
      .select("source", "n", "po_bp", "pe_bp", "kappa_milli"))
}
