package graft

/** Round-8 §2.39 operator checks: in-JVM brute-force recomputation of
  * the backtest / vector-audit / mix-divergence / dataset-card batch. */
class Round8CardsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def lnu(x: Double): Long =
    java.math.BigDecimal.valueOf(math.log(x) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("q_forecast_backtest matches the brute-force seasonal naive") {
    val daily = ops.t(spark, sf, "events")
      .selectExpr("event_type",
        "CAST(unix_micros(ts) AS BIGINT) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2))
      .map { case ((t, d), rs) => (t, d) -> rs.map(_._3).sum }
    val expected = daily.keys.groupBy(_._1).flatMap { case (t, keys) =>
      val scored = keys.toSeq.flatMap { case (_, d) =>
        daily.get((t, d - 7)).map(fc => (daily((t, d)), fc)) }
      if (scored.isEmpty) None
      else {
        val n = scored.length.toLong
        Some((t, n, scored.map { case (a, f) => math.abs(a - f) }.sum / n,
          scored.map { case (a, f) => a - f }.sum / n))
      }
    }.toSet
    val got = run("q_forecast_backtest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_embedding_outliers are each label's true cosine minima") {
    val emb = ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def q(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val expected = emb.groupBy(_._3).toSeq.flatMap { case (l, vs) =>
      val n = vs.length
      // exact integer-division centroid (matches `sq div n`, trunc)
      val centI = (0 until 64).map { j =>
        val sq = vs.map(v => q(v._2(j))).sum
        (sq / n).toDouble
      }
      val scored = vs.map { case (id, e, _) =>
        var dot = 0.0; var nv = 0.0; var nc = 0.0
        for (j <- 0 until 64) {
          dot += e(j).toDouble * centI(j)
          nv += e(j).toDouble * e(j)
          nc += centI(j) * centI(j)
        }
        (id, dot / math.sqrt(nv * nc))
      }
      scored.sortBy { case (id, c) => (c, id) }.take(3).zipWithIndex
        .map { case ((id, _), i) => (l.toLong, id, (i + 1).toLong) }
    }.toSet
    val got = run("q_embedding_outliers").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.size == 30)
  }

  test("q_kl_sources matches the brute-force smoothed divergence") {
    val rows = ops.t(spark, sf, "documents")
      .selectExpr("source", "n_chars div 100").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val buckets = rows.map(_._2).distinct
    val bb = buckets.length.toLong
    val nn = rows.length.toLong
    val cb = rows.groupBy(_._2).map { case (b, o) => b -> o.length.toLong }
    val expected = rows.groupBy(_._1).map { case (src, ds) =>
      val nS = ds.length.toLong
      val csb = ds.groupBy(_._2).map { case (b, o) => b -> o.length.toLong }
      val wsum = buckets.map { b =>
        val c = csb.getOrElse(b, 0L)
        (c + 1) * lnu((c + 1).toDouble * (nn + bb) /
          ((nS + bb).toDouble * (cb(b) + 1)))
      }.sum
      (src, nS, csb.size.toLong, wsum / (nS + bb))
    }.toSet
    val got = run("q_kl_sources").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // divergence of a source from the corpus is ≥ 0 up to quantization
    got.foreach { case (s, _, _, kl) => assert(kl >= -5, s"$s: KL $kl") }
  }

  test("q_dataset_card matches per-source brute-force summary") {
    val docs = ops.t(spark, sf, "documents")
      .select("source", "lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      val toks = ds.map(_._3.toLowerCase.split(" ", -1)
        .count(_.nonEmpty).toLong).sum
      val dis = ds.map(_._3).distinct.length.toLong
      val (topLang, topN) = ds.groupBy(_._2)
        .map { case (l, o) => (l, o.length.toLong) }.toSeq
        .minBy { case (l, c) => (-c, l) }
      (src, n, toks, (n - dis) * 10000 / n, ds.map(_._4).sum / n,
        topLang, topN)
    }.toSet
    val got = run("q_dataset_card").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6))).toSet
    assert(got == expected)
  }
}
