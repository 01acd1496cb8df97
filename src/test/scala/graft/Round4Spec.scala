package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/** Round-4 (§2.17) operator checks: non-vacuity of the discriminating
  * predicates (a filter that rejects nothing tests nothing — the
  * q_fuzzy_match lesson), exactness cross-checks against independent
  * in-memory computations, and plan-shape assertions for the scale
  * claims in the scaladocs. */
class Round4Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def plan(name: String): SparkPlan =
    run(name).queryExecution.sparkPlan

  test("q_repetition_ratio flag discriminates (both outcomes occur)") {
    val flags = run("q_repetition_ratio").select("repetitive")
      .collect().map(_.getBoolean(0))
    assert(flags.contains(true) && flags.contains(false),
      s"repetitive flag is vacuous: ${flags.distinct.mkString(",")}")
  }

  test("q_events_anomaly keeps a strict, non-empty subset") {
    val kept = run("q_events_anomaly").count()
    val all = ops.t(spark, sf, "events").count()
    assert(kept > 0, "threshold rejects everything")
    assert(kept < all / 10, s"threshold too loose: $kept of $all")
  }

  test("q_vector_pq codes match a driver-side exact PQ assignment") {
    val emb = ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cb = (0L until 16L).map(c => c -> emb(c))
    def code(v: Array[Float], b: Int): Long =
      cb.minBy { case (cid, ce) =>
        var d = 0.0
        for (i <- 0 until 8) {
          val diff = v(b * 8 + i).toDouble - ce(b * 8 + i).toDouble
          d += diff * diff
        }
        (d, cid)
      }._1
    val got = run("q_vector_pq").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == emb.size * 8)
    for (((vid, b), c) <- got)
      assert(c == code(emb(vid), b.toInt),
        s"vec $vid block $b: got $c want ${code(emb(vid), b.toInt)}")
  }

  test("q_vector_pq uses multiple codes per block (codebook not collapsed)") {
    val byBlock = run("q_vector_pq").collect()
      .groupBy(_.getLong(1)).map { case (b, rs) =>
        b -> rs.map(_.getLong(2)).distinct.length }
    assert(byBlock.values.forall(_ > 4), s"code spread too small: $byBlock")
  }

  test("q_sample_stratified equalizes strata within sampling noise") {
    val kept = run("q_sample_stratified").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = ops.t(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = counts.values.min
    assert(kept.size == counts.size, "a stratum was emptied")
    for ((lang, k) <- kept) {
      assert(k <= counts(lang))
      // binomial(n, target/n): 4σ ≈ 4·√target around the target mean
      val tol = 4 * math.sqrt(target.toDouble)
      assert(math.abs(k - target) <= tol,
        s"$lang kept $k, target $target ± $tol")
    }
  }

  test("q_pack_chunks shards respect the 500-token budget shape") {
    val rows = run("q_pack_chunks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).distinct.length > 1, "only one shard: vacuous")
    // per source, shard ids are dense 0..k (greedy fill never skips)
    for ((src, shards) <- rows.groupBy(_._1)) {
      val ids = shards.map(_._2).sorted
      assert(ids.sameElements(0L until ids.length),
        s"$src shards not dense: ${ids.mkString(",")}")
    }
  }

  test("q_bm25 emits 5 terms per covered doc, scores ordered") {
    val rows = run("q_bm25").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    // rn <= 5 legitimately emits fewer than 5 terms for docs with under
    // 5 distinct tokens; require the cap, and that the cap is reached.
    val perDoc = rows.groupBy(_._1).values.map(_.length)
    assert(perDoc.forall(n => n >= 1 && n <= 5))
    assert(perDoc.exists(_ == 5), "no doc reached the 5-term cap")
    assert(rows.map(_._3).exists(_ > 0))
  }

  test("q_events_anomaly plan: moments join is broadcast, scan-shaped") {
    assert(plan("q_events_anomaly").collect {
      case j: BroadcastHashJoinExec => j
    }.nonEmpty, "per-type moments should broadcast, not shuffle the scan")
  }

  test("q_vector_pq plan: no window, no shuffle before the output sort") {
    val p = plan("q_vector_pq")
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "PQ assignment must be in-projection argmin, not a window")
    // the single exchange is the orderedAll output repartition(1)
    assert(p.collect { case e: ShuffleExchangeExec => e }.length <= 1,
      "PQ assignment should add no shuffle beyond the output sort")
  }

  test("q_graph_degree endpoint stream is one explode, not a self-union") {
    val gen = plan("q_graph_degree").collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gen.nonEmpty, "expected an explode over pair endpoints")
  }
}
