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

  // --- §2.32 warehouse/stream audits + tokenizer -----------------------

  test("q_fk_orphans is all-green on the dense fixture") {
    val got = run("q_fk_orphans").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length == 5)
    assert(got.forall(_._5 == 0L), s"dense fixture must have no orphans")
    assert(got.forall(r => r._2 >= r._3 && r._3 > 0))
  }

  test("auditFk red path: a drilled orphan is counted") {
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val r = ops.Integrity.auditFk("drill", child, "fk", parent, "pk")
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 2L, 2L, 1L)))
  }

  test("q_late_events matches brute-force arrival-order lateness") {
    val rows = ops.t(spark, sf, "events")
      .selectExpr("event_type", "event_id", "unix_micros(ts) AS us",
        "md5(CAST(event_id AS STRING)) AS arrival")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val expected = rows.groupBy(_._1).map { case (et, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var runMax = Long.MinValue
      val lates = sorted.map { case (_, _, us, _) =>
        val late = if (runMax == Long.MinValue) 0L
                   else math.max(runMax - us, 0L)
        runMax = math.max(runMax, us)
        late
      }
      (et, sorted.size.toLong, lates.count(_ > 3600000000L).toLong,
        lates.max, lates.sum)
    }.toSet
    assert(expected.exists(_._3 > 0), "fixture should contain late events")
    val got = run("q_late_events").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_conversion_lag matches brute-force first-conversion delays") {
    val delays = byUser.toSeq.flatMap { case (_, evs) =>
      val signups = evs.filter(_._3 == "signup").map(_._1)
      if (signups.isEmpty) None
      else {
        val s0 = signups.min
        val ps = evs.filter(e => e._3 == "purchase" && e._1 >= s0)
        if (ps.isEmpty) None else Some(ps.map(_._1).min - s0)
      }
    }
    val expected = delays.groupBy(_ / 86400000000L).map { case (b, ds) =>
      (b, ds.size.toLong, ds.min, ds.max) }.toSet
    assert(expected.nonEmpty)
    val got = run("q_conversion_lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("q_prefix_compress matches brute-force front coding") {
    val docs = ops.t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def cpl(a: String, b: String): Long = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i.toLong
    }
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._2))
      val saved = sorted.zip(sorted.drop(1))
        .map { case (p, c) => cpl(p._3, c._3) }.sum
      val total = sorted.map(_._3.length.toLong).sum
      (src, sorted.size.toLong, total, saved, saved * 10000 / total)
    }.toSet
    assert(expected.exists(_._4 > 0), "sorted runs should share prefixes")
    val got = run("q_prefix_compress").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_bpe_apply matches brute-force merge-and-recount") {
    val joined = ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty)
        .mkString(" "))
    def pairs(ds: Seq[String]): Map[String, Long] =
      ds.flatMap { j =>
        val ts = j.split(" ", -1)
        ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = pairs(joined.toSeq).toSeq
      .minBy { case (p, n) => (-n, p) }._1
    val merged = joined.map(_.replace(top, top.replace(' ', '_'))).toSeq
    val expected = pairs(merged).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20).zipWithIndex
      .map { case ((p, n), i) => ((i + 1).toLong, p, n) }.toSet
    val got = run("q_bpe_apply").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // --- §2.31 linguistics / BI / spectral -------------------------------

  test("q_mode matches brute-force modal priorities") {
    val nk2name = ops.t(spark, sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cust = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = ops.t(spark, sf, "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (nk2name(cust(r.getLong(0))), r.getString(1)))
    val expected = rows.groupBy(_._1).map { case (nation, os) =>
      val counts = os.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (pri, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      (nation, pri, n, os.size.toLong)
    }.toSet
    val got = run("q_mode").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q_allocation distributes exactly 10000 seats, proportionally") {
    val rows = run("q_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._5).sum == 10000L, "seat total must be exact")
    assert(rows.forall { case (_, _, base, extra, seats) =>
      (extra == 0 || extra == 1) && seats == base + extra })
    val tot = rows.map(_._2).sum
    // every seat count is the floor quota or one above it
    assert(rows.forall { case (_, cents, base, _, _) =>
      base == cents * 10000 / tot })
    // largest-remainder: any nation granted an extra seat has remainder
    // >= every nation denied one (ties broken by name)
    val granted = rows.filter(_._4 == 1)
      .map(r => (r._2 * 10000 % tot, r._1))
    val denied = rows.filter(_._4 == 0)
      .map(r => (r._2 * 10000 % tot, r._1))
    assert(granted.forall { case (rg, ng) => denied.forall {
      case (rd, nd) => rg > rd || (rg == rd && ng < nd) } })
  }

  test("q_readability matches brute-force corpus profiling") {
    val docs = ops.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val syl = "[aeiouy]+".r
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val words = ds.map(_._2.toLowerCase.split(" ")
        .count(_.nonEmpty).toLong).sum
      val sylls = ds.map(d => syl.findAllIn(d._2.toLowerCase).size.toLong)
        .sum
      val chars = ds.map(_._2.count(_ != ' ').toLong).sum
      (src, ds.size.toLong, words, sylls, chars,
        sylls * 100 / words, chars * 100 / words)
    }.toSet
    val got = run("q_readability").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
  }

  test("q_concordance matches brute-force KWIC windows") {
    val docs = ops.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))
    val expected = docs.flatMap { case (id, toks) =>
      toks.zipWithIndex.collect { case ("join", i) =>
        (id, (i + 1).toLong,
          toks.slice(math.max(0, i - 2), i).mkString(" "),
          toks.slice(i + 1, i + 3).mkString(" "))
      }
    }.toSet
    assert(expected.nonEmpty)
    val got = run("q_concordance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == expected)
  }

  test("q_naive_bayes matches brute-force lift ranking") {
    val toks = ops.t(spark, sf, "documents")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ")
        .filter(_.nonEmpty).map(tk => (r.getString(0), tk)))
    val nSt = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nT = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nS = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nTot = toks.size.toLong
    val expected = nSt.toSeq.filter(_._2 >= 5)
      .map { case ((src, tk), c) =>
        (src, tk, c, c * nTot * 10000 / (nT(tk) * nS(src))) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, tk, _, lift) => (-lift, tk) }
          .zipWithIndex.take(5)
          .map { case ((src, tk, c, lift), i) =>
            (src, tk, c, lift, (i + 1).toLong) }
      }.toSet
    val got = run("q_naive_bayes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_power_iter matches brute-force quantized matvec") {
    val vecs = ops.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray.map(f =>
        math.round(f.toDouble * 10000)))
    val expected = (0 until 64).map { j =>
      val v1 = vecs.map(q => q(j) * q.sum).sum
      ((j + 1).toLong, v1, vecs.length.toLong)
    }.toSet
    val got = run("q_power_iter").collect()
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
