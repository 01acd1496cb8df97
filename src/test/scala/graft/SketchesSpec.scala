package graft

/** Bounds for the probabilistic sketch operators (no DuckDB oracle)
  * against their exact twins. */
class SketchesSpec extends SparkSpec {

  private def exactPairs: Set[(Long, Long)] =
    SparkEntry.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH: precision 1.0 vs exact Jaccard, recall >= 0.8") {
    val exact = exactPairs
    val got = SparkEntry.queries("q_dedup_minhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), s"false positives: ${got.diff(exact).take(5)}")
    if (exact.nonEmpty)
      assert(got.size.toDouble / exact.size >= 0.8,
        s"recall ${got.size}/${exact.size}")
  }

  test("simhash: exact-duplicate texts collide at hamming 0") {
    // identical token sets → identical simhash; verify via a doc joined
    // to itself through the pair pipeline (a<b filter excludes self, so
    // check determinism instead: two runs agree bit-for-bit)
    val r1 = SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val r2 = SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 == r2)
    assert(r1.forall { case (a, b, h) => a < b && h >= 0 && h <= 8 })
  }

  test("minhash aggregator tier: lane counts match driver-side sketches") {
    // Recompute every signature with the same Aggregator class driver-side
    // and check each emitted pair's lanes_eq exactly; also: every emitted
    // pair clears the 12/16 threshold and no qualifying pair is missed
    // WITHIN a shared band (the candidate contract).
    import graft.functions.MinHashAggregator
    val agg = new MinHashAggregator(16)
    val docs = Tables.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").distinct.filter(_.nonEmpty))
    val sigs = docs.map { case (id, toks) =>
      id -> toks.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
    }.toMap
    def lanesEq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).count { case (x, y) => x == y }.toLong
    val got = SparkEntry.queries("q_dedup_minhash_agg")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, n) =>
      assert(n >= 12 && n == lanesEq(sigs(a), sigs(b)), s"pair ($a,$b)")
    }
    // completeness: any pair agreeing on a full band AND >= 12 lanes must
    // have been emitted (band collision guarantees candidacy)
    val ids = sigs.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      (sa, sb) = (sigs(a), sigs(b))
      if (0 until 8).exists(k =>
        sa(2 * k) == sb(2 * k) && sa(2 * k + 1) == sb(2 * k + 1))
      if lanesEq(sa, sb) >= 12
    } yield (a, b)).toSet
    assert(got.map(t => (t._1, t._2)).toSet == expected)
  }

  test("large-corpus band-join branches equal the small-corpus NLJ paths") {
    // Force the >nljMaxDocs strategy on the small fixture: candidate sets
    // must be identical under either physical plan (a pair is a candidate
    // iff SOME band matches — same logical contract).
    def run(q: String) = SparkEntry.queries(q)(spark, sf).collect()
      .map(_.toSeq).toSet
    val defMh = run("q_dedup_minhash")
    val defAgg = run("q_dedup_minhash_agg")
    spark.conf.set("spark.graft.sketchNljMaxDocs", "0")
    try {
      assert(run("q_dedup_minhash") == defMh)
      assert(run("q_dedup_minhash_agg") == defAgg)
    } finally spark.conf.unset("spark.graft.sketchNljMaxDocs")
  }

  test("simhash banding: identical pair set to brute-force all-pairs") {
    // Independent driver-side reimplementation: signature from first
    // principles (md5-nibble votes — bit k of a token's hash is bit k%4
    // of hex nibble k/4), then O(n²) hamming over all pairs. The
    // 9-segment pigeonhole join must produce EXACTLY this set — the
    // banding guarantee is combinatorial, not probabilistic.
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").distinct.filter(_.nonEmpty))
    val sigs = docs.map { case (id, toks) =>
      val votes = new Array[Int](64)
      toks.foreach { tk =>
        val hex = md5hex(tk)
        for (k <- 0 until 64) {
          val nib = Character.digit(hex.charAt(k / 4), 16)
          votes(k) += (if (((nib >> (k % 4)) & 1) == 1) 1 else -1)
        }
      }
      id -> (0 until 64).map(k =>
        if (votes(k) > 0) 1L << k else 0L).reduce(_ | _)
    }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 8
    } yield (a, b, h.toLong)).toSet
    val got = SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing: ${expected.diff(got).take(5)} extra: ${got.diff(expected).take(5)}")
  }

  test("ann-lsh: reported sims are the true cosines; ranking consistent") {
    val emb = Tables.table(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val rows = SparkEntry.queries("q_ann_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (pid, nid, _, sim) =>
      assert(math.abs(sim - math.rint(cos(emb(pid), emb(nid)) * 1e4) / 1e4)
        <= 1e-4 + 1e-9)
    }
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("multimodal features: deterministic and consistent with payload") {
    val feats = SparkEntry.queries("q_multimodal_features")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.table(spark, sf, "documents").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1).getBytes("UTF-8"), r.getLong(4))).toMap
    assert(feats.length == docs.size)
    feats.foreach { case (id, header, n) =>
      val (bytes, nChars) = docs(id)
      assert(n == nChars)
      assert(header == bytes.take(8).foldLeft(0L)((a, b) => a + (b & 0xff)))
    }
  }

  test("multimodal resize: fixed frame shape, checksums match payload bytes") {
    val rows = SparkEntry.queries("q_multimodal_resize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docs = Tables.table(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    assert(rows.nonEmpty && rows.forall(_._2 == 128L))
    rows.foreach { case (id, _, contentBytes, checksum) =>
      val out = java.util.Arrays.copyOf(docs(id), 128)
      assert(contentBytes == math.min(docs(id).length, 128).toLong)
      assert(checksum == out.foldLeft(0L)((a, b) =>
        (a * 31 + (b & 0xff)) % 2147483647L))
    }
  }

  test("multimodal frames: every 4th 16-byte block, correct checksums") {
    val rows = SparkEntry.queries("q_multimodal_frames")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.table(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, fs) =>
      val expectBlocks = (0 until docs(id).length / 16 by 4).map(_.toLong)
      assert(fs.map(_._2).sorted.toSeq == expectBlocks)
      fs.foreach { case (_, b, checksum) =>
        val frame = docs(id).slice(b.toInt * 16, (b.toInt + 1) * 16)
        assert(checksum == frame.foldLeft(0L)((a, x) => a * 31 + (x & 0xff)))
      }
    }
  }

  test("fingerprint is order-sensitive") {
    import org.apache.spark.sql.functions._
    val fps = SparkEntry.queries("q_fingerprint")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.nonEmpty)
    // distinct texts should overwhelmingly produce distinct fingerprints
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 100).collect()
      .map(r => r.getString(1)).distinct.length
    assert(fps.map(_._2).distinct.length >= docs - 2)
  }
}
