package graft

/** Round-8 §2.30 operator checks: in-JVM brute-force recomputation of
  * the graph-analytics batch (clustering coefficient, Jaccard link
  * prediction, 2-hop frontier) and the user-journey batch (sequence
  * match, interval-overlap concurrency, time-weighted average) —
  * complementing the driver's DuckDB oracle with ground truth derived
  * from first principles on collected fixture rows. */
class Round8Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // --- shared graph ground truth --------------------------------------

  /** Neighbor map of the strict (overlap ≥ 0.49) near-dup doc graph,
    * recomputed from raw token sets. */
  private lazy val (adj, edges): (Map[Long, Set[Long]], Set[(Long, Long)]) = {
    val sets = ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSet))
    val es = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa intersect sb).size.toLong
      if c * 100 >= (sa.size + sb.size) * 49
    } yield (a, b)).toSet
    val nb = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    (nb, es)
  }

  test("q_clustering_coeff matches brute-force neighborhood density") {
    val expected = adj.toSeq.filter(_._2.size >= 2).map { case (u, ns) =>
      val nsSeq = ns.toSeq
      val closed = (for {
        v <- nsSeq; w <- nsSeq if v < w
        if edges.contains((v, w))
      } yield 1).size.toLong
      val deg = ns.size.toLong
      (u, deg, closed, closed * 20000 / (deg * (deg - 1)))
    }.toSet
    assert(expected.nonEmpty && expected.exists(_._3 > 0))
    val got = run("q_clustering_coeff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("q_graph_jaccard matches brute-force common-neighbor pairs") {
    val nodes = adj.keySet.toSeq
    val expected = (for {
      a <- nodes; b <- nodes if a < b
      c = (adj(a) intersect adj(b)).size.toLong if c > 0
      un = adj(a).size + adj(b).size - c
    } yield (a, b, c, c * 10000 / un, edges.contains((a, b)))).toSet
    assert(expected.nonEmpty && expected.exists(!_._5))
    val got = run("q_graph_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == expected)
  }

  test("q_graph_2hop matches brute-force frontier sizes") {
    val expected = adj.map { case (u, ns) =>
      val twoHop = ns.flatMap(adj(_)) -- ns - u
      (u, ns.size.toLong, twoHop.size.toLong)
    }.toSet
    assert(expected.exists(_._3 > 0))
    val got = run("q_graph_2hop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // --- shared events ground truth -------------------------------------

  /** Per-user event lists under the (us, event_id) total order. */
  private lazy val byUser: Map[Long, Seq[(Long, Long, String, Double)]] =
    ops.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type", "value").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))))
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._2).sortBy(t => (t._1, t._2)) }

  test("q_seq_match matches brute-force regex over ordered sequences") {
    val re = "signup.*purchase.*purchase".r
    val expected = byUser.map { case (u, evs) =>
      val seq = evs.map(_._3).mkString(",")
      (u, evs.size.toLong, re.findFirstIn(seq).isDefined)
    }.toSet
    // (at small SF every user has enough events that all may match —
    // only the positive direction is guaranteed non-trivial)
    assert(expected.exists(_._3))
    val got = run("q_seq_match").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
  }

  test("q_interval_overlap matches brute-force sweep-line day maxima") {
    val sessions = byUser.values.flatMap { evs =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((us, _, _, _) <- evs) {
        if (buf.nonEmpty && us - buf.last._2 <= 1800000000L)
          buf(buf.size - 1) = (buf.last._1, us)
        else buf += ((us, us))
      }
      buf.toSeq
    }.toSeq
    val points = sessions.flatMap { case (s, e) =>
      Seq((s, 1L), (e + 1, -1L)) }.sortBy(p => (p._1, p._2))
    var conc = 0L
    val dayMax = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((us, d) <- points) {
      conc += d
      val day = us / 86400000000L
      val (m, n) = dayMax.getOrElse(day, (Long.MinValue, 0L))
      dayMax(day) = (math.max(m, conc), n + 1)
    }
    val expected = dayMax.map { case (d, (m, n)) => (d, m, n) }.toSet
    assert(expected.exists(_._2 > 1))
    val got = run("q_interval_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q_time_weighted_avg matches brute-force holding-time means") {
    val expected = byUser.flatMap { case (u, evs) =>
      val gaps = evs.zip(evs.tail).map { case ((us1, _, _, v), (us2, _, _, _)) =>
        (math.round(v * 100), us2 - us1) }
      if (gaps.isEmpty) None
      else {
        val held = gaps.map(_._2).sum
        Some((u, gaps.size.toLong, held,
          gaps.map { case (c, g) => c * g }.sum / held))
      }
    }.toSet
    assert(expected.nonEmpty)
    val got = run("q_time_weighted_avg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }
}
