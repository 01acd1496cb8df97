package graft

import org.apache.spark.sql.functions._

/** Round-6 integrity/linkage/affinity batch: every query is re-derived
  * in plain JVM code from collected fixture rows (md5 via
  * MessageDigest, Levenshtein via the textbook DP, lift via BigInt) and
  * compared row-for-row — the ground truth that complements the DuckDB
  * oracle's cross-engine check. */
class Round6IntegritySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def nib(h: String, i: Int): Long = // 1-based, like the SQL twin
    java.lang.Long.parseLong(h.substring(i - 1, i), 16)

  // --- q_bloom_join: full JVM mirror of the filter + exact truth -------

  test("q_bloom_join matches a JVM bloom mirror and admits no false negatives") {
    val euro = ops.t(spark, sf, "supplier")
      .join(ops.t(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(ops.t(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "EUROPE")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val probes = ops.t(spark, sf, "lineitem")
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    def positions(k: Long): Seq[(Long, Long)] =
      (0 to 2).map { j =>
        val h = md5hex(s"$k:$j")
        (nib(h, 1), (nib(h, 2) * 16 + nib(h, 3)) % 63)
      }
    val masks = euro.toSeq.flatMap(positions)
      .groupBy(_._1).map { case (w, bs) =>
        w -> bs.map(b => 1L << b._2).reduce(_ | _) }
    def pass(k: Long): Boolean = positions(k).forall { case (w, b) =>
      (masks.getOrElse(w, 0L) & (1L << b)) != 0 }
    val expected = probes.toSeq
      .map(k => (pass(k), euro(k)) match {
        case (true, true)   => "true_pos"
        case (true, false)  => "false_pos"
        case (false, false) => "true_neg"
        case (false, true)  => "false_neg"
      })
      .groupBy(identity).map { case (v, ks) => (v, ks.size.toLong) }
    assert(!expected.contains("false_neg"),
      "JVM mirror produced a bloom false negative — impossible")
    val got = run("q_bloom_join").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.getOrElse("true_pos", 0L) == (euro & probes).size.toLong)
  }

  // --- q_table_checksum: JVM md5 word-sum over the canonical strings ---

  test("q_table_checksum equals JVM md5 word sums and flips on a 1-row edit") {
    def word(h: String, at: Int): Long =
      java.lang.Long.parseLong(h.substring(at - 1, at + 5), 16)
    // canonical renderings mirrored from Integrity's canon columns; the
    // rendering itself is cross-checked engine-vs-engine by the oracle
    val canons = Map(
      "orders" -> ops.t(spark, sf, "orders").select(concat_ws("|",
        col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(12,2)").cast("string"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_orderpriority"))).collect().map(_.getString(0)),
      "customer" -> ops.t(spark, sf, "customer").select(concat_ws("|",
        col("c_custkey").cast("string"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey").cast("string"),
        col("c_acctbal").cast("decimal(12,2)").cast("string")))
        .collect().map(_.getString(0)),
      "nation" -> ops.t(spark, sf, "nation").select(concat_ws("|",
        col("n_nationkey").cast("string"), col("n_name"),
        col("n_regionkey").cast("string"))).collect().map(_.getString(0)))
    val expected = canons.map { case (name, rows) =>
      val hs = rows.map(md5hex)
      (name, (rows.length.toLong, hs.map(word(_, 1)).sum, hs.map(word(_, 7)).sum))
    }
    val got = run("q_table_checksum").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, s"got=$got expected=$expected")
    // sensitivity: replacing one row's hash words changes the sum
    val (n0, c1, _) = expected("nation")
    val h = md5hex(canons("nation").head)
    assert(c1 - word(h, 1) + word(md5hex("tampered"), 1) != c1)
    assert(n0 > 0)
  }

  // --- q_entity_match: blocking must be lossless vs all-pairs ----------

  test("q_entity_match equals brute-force all-pairs Levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = ops.t(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = (for {
      i <- cust.indices; j <- (i + 1) until cust.length
      d = lev(cust(i)._2, cust(j)._2) if d <= 1
    } yield (cust(i)._1, cust(j)._1, d.toLong)).toSet
    assert(expected.nonEmpty, "no distance-1 pairs at test SF — vacuous")
    val got = run("q_entity_match").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  // --- q_doc_perplexity: JVM bigram-LM recount --------------------------

  test("q_doc_perplexity matches a JVM bigram-LM recompute") {
    val toks = ops.t(spark, sf, "documents")
      .filter(col("lang") === "en").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))
    val bg = toks.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1))) }
    val c2 = bg.groupBy(x => (x._2, x._3)).map { case (k, xs) => k -> xs.length }
    val c1 = bg.groupBy(_._2).map { case (k, xs) => k -> xs.length }
    val v = toks.flatMap(_._2).filter(_.nonEmpty).distinct.length
    val expected = bg.filter(_._1 < 100).groupBy(_._1).map { case (id, xs) =>
      val nll = xs.map { case (_, w1, w2) =>
        -math.log((c2((w1, w2)) + 1.0) / (c1(w1) + v.toDouble)) }
      id -> (xs.length.toLong, nll.sum / nll.length)
    }
    assert(expected.nonEmpty, "no en probe docs — vacuous")
    val got = run("q_doc_perplexity").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, (n, s)) <- expected) {
      assert(got(id)._1 == n, s"doc $id bigram count")
      // JVM fold order differs from Spark's partial-agg order; the two
      // sums agree to well under the round(…,4) grain
      assert(math.abs(got(id)._2 - s) <= 2e-4, s"doc $id nll ${got(id)._2} vs $s")
    }
  }

  // --- q_brand_affinity: JVM basket recount ----------------------------

  test("q_brand_affinity matches a JVM basket recount") {
    val ob = ops.t(spark, sf, "lineitem")
      .join(ops.t(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "p_brand").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = ob.map(_._1).distinct.length.toLong
    val marg = ob.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val sup = ob.groupBy(_._1).values.flatMap { basket =>
      val bs = basket.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expected = sup.collect {
      case ((a, b), spt) if spt * 100 >= n =>
        (a, b, spt, marg(a), marg(b),
          (BigInt(spt) * n * 10000 / (BigInt(marg(a)) * marg(b))).toLong)
    }.toSet
    assert(expected.nonEmpty, "no qualifying brand pairs — vacuous")
    val got = run("q_brand_affinity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected,
      s"missed=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }
}
