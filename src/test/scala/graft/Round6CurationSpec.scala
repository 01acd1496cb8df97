package graft

import org.apache.spark.sql.functions._

/** Round-6 §2.20 operator checks: ground-truth cross-checks for the
  * curation/warehouse batch, complementing the driver's DuckDB oracle
  * with in-JVM brute-force recomputation where the operator's value is a
  * pruning/algorithmic claim (prefix filter losslessness, triangle
  * orientation, z-key bijectivity, md5 sign-matrix determinism). */
class Round6CurationSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // --- q_jaccard_prefix: prefix filtering must be LOSSLESS -------------

  test("q_jaccard_prefix equals brute-force all-pairs Jaccard") {
    val dt = ops.t(spark, sf, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"), explode(ops.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sets = dt.groupBy(_._1).map { case (id, ts) =>
      id -> ts.map(_._2).toSet }
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      c = (sets(a) & sets(b)).size
      if c * 19 >= (sets(a).size + sets(b).size) * 9
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "no qualifying pairs at test SF — vacuous")
    val got = run("q_jaccard_prefix").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // force the distinct-mask-group branch (tiny vocab, "large" corpus);
    // must be the same bag
    spark.conf.set("spark.graft.pairNljMaxDocs", "1")
    try {
      val grouped = run("q_jaccard_prefix").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(grouped == expected, "mask-group branch diverged")
      // and with grouping disabled, the at-scale prefix-filter branch
      spark.conf.set("spark.graft.maskGroupMaxDict", "0")
      val prefixed = run("q_jaccard_prefix").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prefixed == expected, "prefix-filter branch diverged")
    } finally {
      spark.conf.unset("spark.graft.pairNljMaxDocs")
      spark.conf.unset("spark.graft.maskGroupMaxDict")
    }
  }

  // --- q_triangle_count: a<b<c orientation counts each triangle once --

  test("q_triangle_count matches driver-side triple loop") {
    val edges = {
      val dt = ops.t(spark, sf, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id"), explode(ops.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "").distinct()
        .collect().map(r => (r.getLong(0), r.getString(1)))
      dt.groupBy(_._1).values.flatMap { ts =>
        val v = ts.map(_._2).distinct.sorted
        for (i <- v.indices; j <- (i + 1) until v.length) yield (v(i), v(j))
      }.toSet
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val perNode = collection.mutable.Map.empty[String, Long]
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if edges((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if edges((nodes(j), nodes(k))) && edges((nodes(i), nodes(k)))
    } Seq(nodes(i), nodes(j), nodes(k)).foreach(n =>
      perNode(n) = perNode.getOrElse(n, 0L) + 1L)
    assert(perNode.nonEmpty, "no triangles at test SF — vacuous")
    val got = run("q_triangle_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == perNode.toMap)
  }

  test("degree orientation bounds hub wedge fan-out vs token order") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // A stopword-shaped hub sitting mid-alphabet: token-name orientation
    // splits its 80 edges into 40 in + 40 out → 1600 wedge candidates
    // through the hub; degree orientation points ALL of them into the hub
    // → 0 wedges through it. Two spoke-spoke edges close two triangles.
    val hub = "mmm"
    val lo = (1 to 40).map(i => f"aaa$i%03d")
    val hi = (1 to 40).map(i => f"zzz$i%03d")
    val raw = lo.map(t => (t, hub)) ++ hi.map(t => (hub, t)) ++
      Seq(("aaa001", "zzz001"), ("aaa002", "zzz002"))
    val und = raw.toDF("ta", "tb")
    val tokenOriented = und.select(col("ta").as("src"), col("tb").as("dst"))
    def wedges(e: DataFrame): Long =
      e.as("e1").join(e.as("e2"), col("e1.dst") === col("e2.src")).count()
    val wTok = wedges(tokenOriented)
    val wDeg = wedges(ops.Curation.degreeOrientedEdges(und))
    assert(wDeg * 20 < wTok,
      s"degree-orientation wedges $wDeg not ≪ token-order $wTok")
    // both orientations close the same triangle set
    def tris(e: DataFrame) = ops.Curation.wedgeClosure(e).collect()
      .map(r => Set(r.getString(0), r.getString(1), r.getString(2))).toSet
    val (tTok, tDeg) = (tris(tokenOriented),
      tris(ops.Curation.degreeOrientedEdges(und)))
    assert(tTok == tDeg && tDeg.size == 2)
  }

  // --- q_zorder: the interleave must be a bijection on the grid -------

  test("q_zorder key is a bijective interleave of its two axes") {
    val rows = run("q_zorder").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (zx, zy, zkey) =>
      // decode even/odd bits back out of the key
      def debit(k: Long, off: Int): Long =
        (0 until 6).map(i => ((k >> (2 * i + off)) & 1L) << i).sum
      assert(debit(zkey, 0) == zx && debit(zkey, 1) == zy,
        s"zkey $zkey does not decode to ($zx, $zy)")
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length ==
      rows.map(_._3).distinct.length)
  }

  // --- q_scd2: intervals tile each customer's timeline ----------------

  test("q_scd2 intervals are ordered, contiguous, change-only") {
    val rows = run("q_scd2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, ivs0) =>
      val ivs = ivs0.sortBy(_._3)
      ivs.sliding(2).foreach {
        case Array((_, p1, _, to1), (_, p2, f2, _)) =>
          assert(to1.contains(f2), s"gap in customer $ck timeline")
          assert(p1 != p2, s"non-change row for customer $ck")
        case _ => ()
      }
      assert(ivs.last._4.isEmpty, s"customer $ck has no open interval")
      assert(ivs.init.forall(_._4.nonEmpty))
    }
  }

  // --- q_gap_fill: dense spine, non-null fill, exact on observed days -

  test("q_gap_fill spine is dense and fill is non-null") {
    val rows = run("q_gap_fill").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val days = rs.map(_.getLong(1)).sorted
      assert(days.last - days.head + 1 == days.length, "spine not dense")
    }
    assert(rows.forall(!_.isNullAt(3)), "forward fill emitted NULL")
    // non-gap rows carry their own daily total
    val daily = ops.t(spark, sf, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(round(sum(col("value")), 4).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    rows.filter(!_.getBoolean(4)).foreach { r =>
      assert(daily((r.getString(0), r.getLong(1))) == r.getDouble(3))
    }
  }

  // --- q_winsorize: clamp fractions bounded by the quantile spec ------

  test("q_winsorize clamps at most the tail fractions") {
    run("q_winsorize").collect().foreach { r =>
      val (n, nLo, nHi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nLo <= (5 * n + 99) / 100 && nHi <= n - (95 * n + 99) / 100 + 1,
        s"clamp counts out of spec for ${r.getString(0)}")
    }
  }

  // --- q_attribution: purchases are conserved -------------------------

  test("q_attribution conserves the purchase count") {
    val total = ops.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val got = run("q_attribution").collect().map(_.getLong(1)).sum
    assert(got == total, s"attributed $got of $total purchases")
  }

  // --- q_cdc_diff: op taxonomy is consistent with the snapshots -------

  test("q_cdc_diff ops agree with snapshot membership") {
    val rows = run("q_cdc_diff").collect()
    assert(rows.nonEmpty)
    val before = ops.t(spark, sf, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01"))
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (ck, op) = (r.getLong(0), r.getString(1))
      op match {
        case "insert" => assert(!before(ck) && r.isNullAt(2))
        case "update" => assert(before(ck) &&
          (r.getLong(2) != r.getLong(3) || r.getString(4) != r.getString(5)))
        case other => fail(s"unexpected op $other (append-only fixture)")
      }
    }
  }

  // --- q_sample_reservoir: exact k per stratum, content-addressed -----

  test("q_sample_reservoir takes exactly k=3 per sufficiently-large lang") {
    val langSizes = ops.t(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q_sample_reservoir").collect()
      .groupBy(_.getString(0)).map { case (l, rs) => l -> rs.length }
    langSizes.foreach { case (l, n) =>
      assert(got.getOrElse(l, 0) == math.min(3L, n).toInt)
    }
  }

  // --- q_pii_redact / q_text_normalize / q_url_extract ----------------

  test("q_pii_redact finds exactly the injected contacts") {
    val perSource = ops.t(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_pii_redact").collect().foreach { r =>
      val n = perSource(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == n && r.getLong(3) == n,
        s"redaction counts off for ${r.getString(0)}")
      assert(r.getLong(4) > 0, "redaction must shrink the text")
    }
  }

  test("q_text_normalize recovers the clean text modulo duplication") {
    // norm('  UPPER(text) !!! text??  ') == text ' ' text, so the distinct
    // normalized count per lang equals the distinct raw-text count.
    val distinctTexts = ops.t(spark, sf, "documents")
      .groupBy("lang").agg(countDistinct(col("text")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_text_normalize").collect().foreach { r =>
      assert(r.getLong(2) == distinctTexts(r.getString(0)))
      assert(r.getLong(4) < r.getLong(3), "normalization must shrink chars")
    }
  }

  test("q_url_extract hosts partition the corpus by source") {
    val perSource = ops.t(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q_url_extract").collect()
    assert(rows.length == perSource.size)
    rows.foreach { r =>
      val src = r.getString(0).stripSuffix(".example.com")
      assert(r.getLong(1) == perSource(src))
      assert(r.getLong(3) == 3L, "path depth must be /lang/doc/id = 3")
    }
  }

  // --- q_random_projection: JVM md5 recomputation ---------------------

  test("q_random_projection matches in-JVM md5 sign matrix") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val signs = Array.tabulate(8, 64) { (d, j) =>
      if ("02468ace".contains(md5hex(s"$d:$j").charAt(0))) 1L else -1L
    }
    val emb = ops.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1000.0).toLong))
    val expected = (for {
      (id, q) <- emb; d <- 0 until 8
    } yield (id, d.toLong) ->
      (0 until 64).map(j => signs(d)(j) * q(j)).sum).toMap
    val got = run("q_random_projection").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }
}
