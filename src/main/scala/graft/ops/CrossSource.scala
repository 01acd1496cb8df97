package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 cross-source contamination matrices (SURVEY §2.92): which
  * SOURCES share content — exact-duplicate doc pairs per source pair,
  * shared 8-gram spans per source pair, and the near-dup pair matrix
  * over the strict token-Jaccard predicate. The provenance view of the
  * dedup family: q_dup_spans says HOW MUCH is duplicated, these say
  * BETWEEN WHOM (the "who copied whom" audit that decides source-level
  * dedup ordering).
  *
  * Scale: every matrix is ≤ sources² rows; generators are hash-grouped
  * (exact), span-grouped with per-span source lists bounded by the
  * source dimension, or the stats-driven nearPairs machinery. */
object CrossSource {

  /** Exact-dup source matrix (§2.92): duplicate groups under the
    * q_dedup_exact key (md5 of the first-8-token prefix — full-text md5
    * has zero groups below sf0.1 in this corpus, which would make the
    * matrix vacuous) spanning ≥ 2 sources → per ordered source pair
    * (sa < sb), the number of cross-source DUP DOC PAIRS (Σ over hashes
    * of c_a·c_b) and the distinct hashes shared. Hash-group collapse
    * first — never a doc×doc comparison. */
  def qCrossSourceDupes(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "documents")
      .select(md5(concat_ws(" ", slice(tokens(col("text")), 1, 8)))
        .as("h"), col("source"))
      .groupBy("h", "source").agg(count(lit(1)).as("c"))
    orderedAll(g.as("a").join(g.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_hashes"),
        sum(expr("a.c * b.c")).cast("long").as("n_dup_pairs")))
  }

  /** Shared-span source matrix (§2.92): per source pair, the number of
    * DISTINCT 8-gram token spans both emit (the q_dup_spans span
    * universe). (span, source) collapses first; the per-span self-join
    * fans out to at most C(|sources|, 2) rows per span. */
  def qSourceSpanMatrix(s: SparkSession, dir: String): DataFrame = {
    val spans = t(s, dir, "documents")
      .select(col("source"), tokens(col("text")).as("toks"))
      .select(col("source"), explode(expr(
        """filter(
          |  transform(toks, (x, i) ->
          |    CASE WHEN i < size(toks) - 7
          |         THEN concat(x, ' ', toks[i+1], ' ', toks[i+2], ' ',
          |                     toks[i+3], ' ', toks[i+4], ' ', toks[i+5],
          |                     ' ', toks[i+6], ' ', toks[i+7]) END),
          |  g -> g IS NOT NULL)""".stripMargin)).as("span"))
      .distinct()
    orderedAll(spans.as("a").join(spans.as("b"),
        col("a.span") === col("b.span") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_spans")))
  }

  /** Near-dup source matrix (§2.92): the strict q_dedup_near pair set
    * (token Jaccard ≥ 0.8 on en docs) attributed to canonically-ordered
    * source pairs — within-source pairs land on the diagonal
    * (source_a = source_b). Rides the §2.11 stats-driven pair
    * machinery (now session-PINNED — one derivation feeds the whole
    * exact family); the matrix fold is one ≤ sources² aggregate.
    *
    * Density gate (round-10 item 6, default OFF): when
    * `spark.graft.dedupMaxPairsPerDoc` is set and the md5-band
    * collision estimate trips it (Sketches.gatedClusters), exact pair
    * enumeration is output-bound — the matrix folds over the
    * LSH-cluster MEMBERSHIP instead: per (cluster, source) member
    * counts c, cross cells Σ c_a·c_b and diagonal Σ C(c,2) per
    * cluster. That counts the transitive within-cluster pair closure —
    * the production dedup contract at that density (same swap the
    * minhash family made in rounds 7/9) — and its cost is
    * clusters × sources², never Ω(pairs). Spec-forced against an
    * independent fold over the same gated labels
    * (Round10GateSpec). */
  def qNearDupSources(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    Sketches.gatedClusters(s, dir) match {
      case Some(cl) =>
        val cs = cl.join(src, "doc_id")
          .groupBy("cluster_id", "source").agg(count(lit(1)).as("c"))
        val cross = cs.as("a").join(cs.as("b"),
            col("a.cluster_id") === col("b.cluster_id") &&
              col("a.source") < col("b.source"))
          .select(col("a.source").as("source_a"),
            col("b.source").as("source_b"),
            (col("a.c") * col("b.c")).as("np"))
        val diag = cs.select(col("source").as("source_a"),
          col("source").as("source_b"), expr("c * (c - 1) div 2").as("np"))
        orderedAll(cross.unionAll(diag)
          .groupBy("source_a", "source_b")
          .agg(sum("np").cast("long").as("n_pairs"))
          .filter(col("n_pairs") > 0)
          .withColumn("cross_source", col("source_a") =!= col("source_b")))
      case None =>
        orderedAll(Text.nearPairs(s, dir).select("a_id", "b_id")
          .join(src.select(col("doc_id").as("a_id"),
            col("source").as("s_a")), "a_id")
          .join(src.select(col("doc_id").as("b_id"),
            col("source").as("s_b")), "b_id")
          .groupBy(least(col("s_a"), col("s_b")).as("source_a"),
            greatest(col("s_a"), col("s_b")).as("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("cross_source", col("source_a") =!= col("source_b")))
    }
  }
}
