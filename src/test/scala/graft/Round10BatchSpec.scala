package graft

import org.apache.spark.sql.Row

/** Round-10 §2.35 batch: invariant bounds per query on top of the
  * DuckDB oracle (which checks exact values at the graded SF) — these
  * pin the SEMANTICS a hash can't explain: monotonicity across band
  * layouts, conservation of totals, brute-force twins for the window
  * idioms. */
class Round10BatchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_band_sweep: candidates shrink as rows-per-band grow") {
    val rows = run("q_band_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._2)
    assert(rows.map(x => (x._1, x._2)).toSeq ==
      Seq((8L, 2L), (4L, 4L), (2L, 8L)).sortBy(_._2))
    // more rows per band = stricter candidacy: counts non-increasing in r
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3)
    // closed-form recall at J=0.8 — exact expected literals
    assert(rows.map(_._4).toSeq == Seq(9997L, 8785L, 3074L))
  }

  test("q_dedup_impact: conservation against the cluster labels") {
    val imp = run("q_dedup_impact").collect()
    assert(imp.nonEmpty)
    for (r <- imp) {
      assert(r.getLong(2) <= r.getLong(1), "n_dropped <= n_docs")
      assert(r.getLong(4) <= r.getLong(3), "toks_dropped <= toks_total")
      val bp = r.getLong(5)
      assert(bp >= 0 && bp <= 10000)
    }
    val totalDropped = imp.map(_.getLong(2)).sum
    val keepFalse = run("q_dedup_clusters").collect()
      .count(r => !r.getBoolean(2))
    assert(totalDropped == keepFalse,
      s"impact drops $totalDropped docs, labels say $keepFalse")
  }

  test("q_join_asof_forward: brute-force twin per user") {
    import org.apache.spark.sql.functions._
    val ev = ops.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._1)).toSeq
      sorted.zipWithIndex.map { case (r, i) =>
        val next = sorted.drop(i + 1)
          .filter(_._3 == "purchase").map(_._4)
        r._1 -> (if (next.isEmpty) None else Some(next.min))
      }
    }.toMap
    val got = run("q_join_asof_forward").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("q_top_bottom: per-nation leaderboard shape") {
    val rows = run("q_top_bottom").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    for ((_, g) <- rows.groupBy(r => (r._1, r._2))) {
      assert(g.length <= 3)
      val byRk = g.sortBy(_._3)
      assert(byRk.map(_._3).toSeq == (1L to g.length).toSeq)
      val cents = byRk.map(_._5)
      if (byRk.head._2 == "top")
        assert(cents.zip(cents.tail).forall { case (a, b) => a >= b })
      else
        assert(cents.zip(cents.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q_dormancy: user conservation across bands") {
    import org.apache.spark.sql.functions._
    val users = ops.t(spark, sf, "events")
      .select(countDistinct(col("user_id"))).head.getLong(0)
    val rows = run("q_dormancy").collect()
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b <= 3))
    assert(rows.map(_.getLong(1)).sum == users)
  }

  test("q_pq_balance: 8 blocks over the full corpus, codes bounded") {
    import org.apache.spark.sql.functions._
    val n = ops.t(spark, sf, "embeddings").count()
    val rows = run("q_pq_balance").collect()
    assert(rows.length == 8)
    for (r <- rows) {
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 16, "codes_used in 1..16")
      assert(r.getLong(2) >= r.getLong(3), "max_occ >= min_occ")
      assert(r.getLong(4) == n, "every vector coded in every block")
      assert(r.getLong(5) >= 10000, "imbalance >= uniform floor")
    }
  }

  test("q_token_run: doc conservation + brute-force twin on one doc") {
    import org.apache.spark.sql.functions._
    val docs = ops.t(spark, sf, "documents")
    val rows = run("q_token_run").collect()
    assert(rows.map(_.getLong(0)).forall(_ >= 1))
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // brute-force the max run of the first doc
    val first = docs.orderBy("doc_id").select("text").head.getString(0)
    val toks = first.toLowerCase.split(" ", -1)
    var best = 1; var cur = 1
    for (i <- 1 until toks.length) {
      if (toks(i) == toks(i - 1)) { cur += 1; best = math.max(best, cur) }
      else cur = 1
    }
    // the histogram must have mass at a run_len >= that doc's run only
    // if equal; weaker but deterministic: the doc's run is <= max bin
    assert(rows.map(_.getLong(0)).max >= best)
  }

  test("q_sample_systematic: exactly ceil(N/20) units sampled") {
    import org.apache.spark.sql.functions._
    val n = ops.t(spark, sf, "customer").count()
    val rows = run("q_sample_systematic").collect()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.map(_.getLong(2)).sum == (n + 19) / 20,
      "systematic sample size is exact, not Bernoulli-variable")
  }

  test("q_rate_limit: only violators emitted, burst above the bar") {
    val rows = run("q_rate_limit").collect()
    assert(rows.nonEmpty, "fixture must contain at least one burst")
    for (r <- rows) {
      assert(r.getLong(2) > 2, "max_burst above the threshold")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(1))
    }
  }

  test("q_knn_classify: probe conservation and bp bounds") {
    val rows = run("q_knn_classify").collect()
    assert(rows.map(_.getLong(1)).sum == 30, "every probe classified once")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
    }
  }
}
