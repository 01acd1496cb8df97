package graft

import org.apache.spark.sql.DataFrame

/** Round-7 checks: the density-gated cluster-representative output
  * contract for the sketch dedup family (VERDICT r6 "what's wrong" #2).
  * Above the gate the contract is connected components of the BAND-BUCKET
  * COLLISION graph (the candidate graph — no pair enumeration, no exact
  * verify: the production LSH-clustering semantics), so the ground truth
  * here is a driver-side union-find over brute-force candidate pairs
  * recomputed from first principles. */
class Round7Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** Union-find components of a pair list → (doc -> min-of-component). */
  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def enDocTokens: Array[(Long, Array[String])] =
    Tables.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").distinct.filter(_.nonEmpty))

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_dedup_minhash density gate emits candidate-graph components") {
    // First principles: the relational pipeline's lanes are minima of
    // 15-hex md5 prefixes (BIGINT in Spark, string in the oracle — same
    // order); candidates share at least one 2-lane band.
    val sigs = enDocTokens.map { case (id, toks) =>
      id -> Array.tabulate(16)(j =>
        toks.map(t => md5hex(s"$j:$t").substring(0, 15)).min)
    }
    val ids = sigs.map(_._1).sorted
    val sigMap = sigs.toMap
    val candidates = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (sa, sb) = (sigMap(ids(i)), sigMap(ids(j)))
      if (0 until 8).exists(b =>
        sa(2 * b) == sb(2 * b) && sa(2 * b + 1) == sb(2 * b + 1))
    } yield (ids(i), ids(j))
    val expected = components(candidates)
    assert(expected.nonEmpty, "no candidate pairs at test SF — vacuous")
    val reps = withConf("spark.graft.dedupMaxPairsPerDoc" -> "0") {
      run("q_dedup_minhash").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    }
    assert(reps.map(_._1).toSet == expected.keySet,
      "cluster mode must cover exactly the collision-graph docs")
    reps.foreach { case (doc, cluster, keep) =>
      assert(cluster == expected(doc),
        s"doc $doc labeled $cluster, union-find says ${expected(doc)}")
      assert(keep == (doc == cluster))
    }
  }

  test("q_dedup_minhash_agg density gate emits candidate-graph components") {
    // The agg tier's gate lives on the at-scale band branch; its
    // candidates share a (sig[2k], sig[2k+1]) band of the typed
    // Aggregator's signature.
    val agg = new graft.functions.MinHashAggregator(16)
    val sigs = enDocTokens.map { case (id, toks) =>
      id -> toks.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
    }
    val ids = sigs.map(_._1).sorted
    val sigMap = sigs.toMap
    val candidates = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (sa, sb) = (sigMap(ids(i)), sigMap(ids(j)))
      if (0 until 8).exists(k =>
        sa(2 * k) == sb(2 * k) && sa(2 * k + 1) == sb(2 * k + 1))
    } yield (ids(i), ids(j))
    val expected = components(candidates)
    assert(expected.nonEmpty)
    val reps = withConf("spark.graft.sketchNljMaxDocs" -> "1",
      "spark.graft.dedupMaxPairsPerDoc" -> "0") {
      run("q_dedup_minhash_agg").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(reps == expected)
  }

  test("entity-match general mode finds every d<=1 pair at mixed lengths") {
    import spark.implicits._
    // Variable-length names exercising every d<=1 modality: equality,
    // substitution (same length), insertion/deletion (len +- 1) at head,
    // middle, and tail — plus d=2 pairs that must NOT match.
    val names = Seq(
      1L -> "cust123", 2L -> "cust123",   // equal
      3L -> "kust123",                    // substitution at head
      4L -> "cust124",                    // substitution at tail
      5L -> "cust1234",                   // insertion at tail vs 1
      6L -> "ust123",                     // deletion at head vs 1
      7L -> "cst123",                     // deletion mid vs 1
      8L -> "abcdefg",                    // far from everything
      9L -> "cust12",                     // deletion at tail vs 1
      10L -> "xust124")                   // d=2 vs 1, d=1 vs 4
    val dir = java.nio.file.Files.createTempDirectory("graft_r7").toString
    names.map { case (k, n) => (k, n, 1, 0.0, "BUILDING") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i)._2, names(j)._2) if d <= 1
    } yield (names(i)._1, names(j)._1, d.toLong)).toSet
    assert(expected.exists(_._3 == 0) && expected.exists(_._3 == 1))
    val got = withConf("spark.graft.entityMatchGeneral" -> "true") {
      ops.Curation.qEntityMatch(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(got == expected,
      s"missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("entity-match general mode equals segment mode on the fixture") {
    val base = run("q_entity_match").collect().map(_.toSeq).toSeq
    val general = withConf("spark.graft.entityMatchGeneral" -> "true") {
      run("q_entity_match").collect().map(_.toSeq).toSeq
    }
    assert(general == base)
  }

  test("density gate stays OFF below threshold (pair list unchanged)") {
    // A generous threshold the fixture does NOT exceed must keep the
    // graded pair-list contract byte-identical.
    val base = run("q_dedup_minhash").collect().map(_.toSeq).toSeq
    val gated = withConf("spark.graft.dedupMaxPairsPerDoc" -> "1000000") {
      run("q_dedup_minhash").collect().map(_.toSeq).toSeq
    }
    assert(gated == base)
  }

  // ---- §2.21 ground-truth cross-checks --------------------------------

  test("q_filter_cascade conserves documents and basis points") {
    val rows = run("q_filter_cascade").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val perSource = Tables.table(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum == perSource(src),
        s"stage counts for $src don't partition the source")
      assert(rs.map(_._4).sum <= 10000,
        "floor-divided shares must not exceed 10000 bp")
      assert(rs.map(_._2).toSet.subsetOf(
        Set("len", "tokens", "repetition", "kept")))
    }
  }

  test("q_shingle_novelty: every shingle is novel somewhere exactly once") {
    val rows = run("q_shingle_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, novel, bp) =>
      assert(novel >= 0 && novel <= total)
      assert(bp == novel * 10000 / total)
    }
    // Σ novel over docs = number of distinct shingles in the corpus
    // (each shingle's first occurrence is charged exactly once).
    val distinctShingles = Tables.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .collect().flatMap { r =>
        val t = r.getString(1).toLowerCase.split(" ")
        t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      }.toSet
    assert(rows.map(_._3).sum == distinctShingles.size)
  }

  test("q_ohlc bars are internally consistent and complete") {
    val rows = run("q_ohlc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, open, high, low, close, n) =>
      assert(low <= high && open >= low && open <= high &&
        close >= low && close <= high && n >= 1)
    }
    assert(rows.map(_._7).sum == Tables.table(spark, sf, "events").count())
  }

  test("q_rank_corr matches a driver-side Spearman recompute") {
    val data = Tables.table(spark, sf, "orders")
      .join(Tables.table(spark, sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "c_acctbal", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val expected = data.groupBy(_._1).map { case (seg, rs) =>
      val rx = rs.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val ry = rs.sortBy(r => (r._4, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val n = rs.length.toLong
      val sumD2 = rs.map { r =>
        val d = rx(r._2) - ry(r._2); d * d }.sum
      seg -> (n, sumD2, 10000L - (60000L * sumD2) / (n * (n * n - 1)))
    }
    val got = run("q_rank_corr").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("q_cluster_cohesion matches a driver-side integer recompute") {
    val vecs = Tables.table(spark, sf, "embeddings").collect()
      .map(r => (r.getInt(2), r.getLong(0),
        r.getSeq[Float](1).map(f =>
          math.floor(f.toDouble * 1000.0).toLong).toArray))
    val expected = vecs.groupBy(_._1).map { case (label, vs) =>
      val n = vs.length
      val cent = Array.tabulate(64) { i =>
        math.floor(vs.map(_._3(i)).sum.toDouble / n).toLong }
      val d2s = vs.map { case (_, _, q) =>
        (0 until 64).map(i => (q(i) - cent(i)) * (q(i) - cent(i))).sum }
      label -> (n.toLong, d2s.sum / n, d2s.max)
    }
    val got = run("q_cluster_cohesion").collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("q_dup_ratio: distinct + dup partition each source") {
    val rows = run("q_dup_ratio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, distinct, dup, xsrc) =>
      assert(distinct + dup == n)
      assert(xsrc >= 0 && xsrc <= n)
    }
  }
}
