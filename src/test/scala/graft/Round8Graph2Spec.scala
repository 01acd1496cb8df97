package graft

/** Round-8 §2.42 operator checks: in-JVM brute-force recomputation of
  * the modularity / assortativity / rich-club structure metrics over
  * the strict near-dup graph. */
class Round8Graph2Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Undirected strict near-dup adjacency (common·100 ≥ 49·(na+nb) on
    * distinct token sets of en docs) — brute-forced over all pairs
    * (the Round8GraphSpec construction). */
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

  private lazy val edgeList: Seq[(Long, Long)] =
    adj.toSeq.flatMap { case (u, vs) => vs.filter(_ > u).map(u -> _) }

  test("q_graph_modularity matches brute force and sums to a sane Q") {
    val l1 = adj.map { case (u, vs) => u -> math.min(u, vs.min) }
    val m = edgeList.size.toLong
    val expected = l1.groupBy(_._2).map { case (lbl, members) =>
      val nodes = members.keySet
      val eIn = edgeList.count { case (a, b) =>
        l1(a) == lbl && l1(b) == lbl && nodes(a) && nodes(b) }.toLong
      val dTot = members.keys.toSeq.map(u => adj(u).size.toLong).sum
      val contrib = (4 * m * eIn - dTot * dTot) * 1000000L / (4 * m * m)
      (lbl, nodes.size.toLong, eIn, dTot, contrib)
    }.toSet
    val got = run("q_graph_modularity").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // Q = sum of contribs must land in the valid (-0.5, 1] band
    val q = got.toSeq.map(_._5).sum
    assert(q > -500000L && q <= 1000000L)
  }

  test("q_assortativity matches the brute-force moment computation") {
    val deg = adj.map { case (u, vs) => u -> vs.size.toLong }
    val ends = edgeList.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = ends.size.toLong
    val sx = ends.map(_._1).sum
    val sxx = ends.map(e => e._1 * e._1).sum
    val sxy = ends.map(e => e._1 * e._2).sum
    val slope = (n * sxy - sx * sx) * 1000 / (n * sxx - sx * sx)
    val got = run("q_assortativity").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (n, sx, sxx, sxy, slope))
  }

  test("q_rich_club matches the brute-force decile club") {
    val deg = adj.map { case (u, vs) => u -> vs.size.toLong }
    val nNodes = deg.size.toLong
    val nRich = (nNodes + 9) / 10
    val rich = deg.toSeq.sortBy { case (u, d) => (-d, u) }
      .take(nRich.toInt).map(_._1).toSet
    val eRich = edgeList.count { case (a, b) => rich(a) && rich(b) }.toLong
    val possible = nRich * (nRich - 1) / 2
    val got = run("q_rich_club").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) ==
      (nNodes, nRich, eRich, possible, eRich * 10000 / possible))
    // a decile club has at most C(nRich,2) edges by construction
    assert(eRich <= possible)
  }
}
