package graft

/** Round-8 §2.36 operator checks: in-JVM brute-force recomputation of
  * the community/curation/sampling batch (label propagation, k-core,
  * boilerplate audit, hard negatives) from collected fixture rows. */
class Round8GraphSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Undirected strict near-dup adjacency (common·100 ≥ 49·(na+nb) on
    * distinct token sets of en docs) — brute-forced over all pairs. */
  private lazy val adj: Map[Long, Seq[Long]] = {
    val docs = ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty).toSet))
    val edges = for {
      (a, ta) <- docs.toSeq; (b, tb) <- docs.toSeq if a < b
      common = ta.intersect(tb).size
      if common * 100 >= 49 * (ta.size + tb.size)
    } yield (a, b)
    (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
  }

  test("q_label_prop matches brute-force two-step propagation") {
    val l1 = adj.map { case (u, vs) => u -> math.min(u, vs.min) }
    val expected = adj.map { case (u, vs) =>
      val counts = vs.map(l1).groupBy(identity)
        .map { case (l, o) => (l, o.size) }
      val label2 = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      (u, l1(u), label2, label2 != l1(u))
    }.toSet
    val got = run("q_label_prop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("q_kcore matches brute-force peeling and is a fixpoint") {
    var cur = adj.map { case (u, vs) => u -> vs.toSet }
    for (_ <- 1 to 4) {
      val keep = cur.filter(_._2.size >= 3).keySet
      cur = cur.collect { case (u, vs) if keep(u) =>
        u -> vs.intersect(keep) }
    }
    val expected = cur.map { case (u, vs) => (u, vs.size.toLong) }.toSet
    val got = run("q_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // the graded 4-round contract reaches the true 3-core on the fixture:
    // one more peel changes nothing
    assert(cur.values.forall(_.size >= 3), "fixture not at fixpoint in 4")
    assert(expected.nonEmpty)
  }

  test("q_boilerplate matches brute-force per-source line audit") {
    val docs = ops.t(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1)))
    val lines = docs.flatMap { case (id, src, toks) =>
      (0 to (toks.length - 1) / 5).map(i =>
        (id, src, toks.slice(i * 5, i * 5 + 5).mkString(" ")))
    }.distinct
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val nDocs = ds.map(_._1).distinct.length.toLong
      val df = lines.filter(_._2 == src).groupBy(_._3)
        .map { case (l, o) => (l, o.length.toLong) }
      val (topLine, topDf) = df.toSeq.minBy { case (l, c) => (-c, l) }
      (src, nDocs, df.size.toLong, df.count(_._2 >= 2).toLong,
        df.count(_._2 * 10 >= nDocs).toLong, topDf, topLine)
    }.toSet
    val got = run("q_boilerplate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSet
    assert(got == expected)
  }

  test("q_hard_negatives returns only other-label top-similarity rows") {
    val emb = ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val expected = emb.filter(_._1 < 20).flatMap { case (pid, pe, pl) =>
      emb.filter(e => e._1 != pid && e._3 != pl)
        .map(e => (e._1, e._3, cos(pe, e._2)))
        .sortBy { case (nid, _, c) => (-c, nid) }.take(3).zipWithIndex
        .map { case ((nid, nl, _), i) =>
          (pid, pl.toLong, nid, nl.toLong, (i + 1).toLong) }
    }.toSet
    val got = run("q_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getInt(3).toLong, r.getLong(4))).toSet
    assert(got == expected)
    assert(got.size == 60)
  }
}
