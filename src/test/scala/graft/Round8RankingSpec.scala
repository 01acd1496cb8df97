package graft

/** Round-8 §2.44 operator checks: in-JVM brute-force recomputation of
  * MAP@10 and the precision@k curve over the q_ndcg retrieval run. */
class Round8RankingSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per probe (vec_id < 20): the top-10 (rank, rel) rows of the exact
    * cosine ranking with (cos desc, vec_id asc) tie order. */
  private lazy val top10: Map[Long, Seq[(Int, Long)]] = {
    val emb = ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val probes = emb.filter(_._1 < 20)
    probes.map { case (pid, pe, pl) =>
      val scored = emb.filter(_._1 != pid).map { case (id, e, l) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (j <- 0 until 64) {
          dot += pe(j).toDouble * e(j).toDouble
          na += pe(j).toDouble * pe(j).toDouble
          nb += e(j).toDouble * e(j).toDouble
        }
        (id, dot / math.sqrt(na * nb), if (l == pl) 1L else 0L)
      }
      pid -> scored.sortBy { case (id, c, _) => (-c, id) }.take(10)
        .zipWithIndex.map { case ((_, _, rel), i) => (i + 1, rel) }.toSeq
    }.toMap
  }

  test("q_map_at_k matches brute-force average precision") {
    val expected = top10.map { case (pid, rows) =>
      val nRel = rows.map(_._2).sum
      var cum = 0L
      val apSum = rows.map { case (rn, rel) =>
        cum += rel
        if (rel == 1) cum * 1000000L / rn else 0L
      }.sum
      (pid, nRel, apSum, if (nRel > 0) apSum / nRel else 0L)
    }.toSet
    val got = run("q_map_at_k").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // AP@10 is a mean of precisions, so it lands in [0, 10^6]
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000L))
  }

  test("q_precision_at_k matches brute force and decays sanely") {
    val expected = Seq(1, 5, 10).map { k =>
      val tot = top10.values.map(_.take(k).map(_._2).sum).sum
      (k.toLong, top10.size.toLong, tot,
        tot * 10000 / (k * top10.size))
    }.toSet
    val got = run("q_precision_at_k").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
