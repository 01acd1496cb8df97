package graft

import org.apache.spark.sql.functions._

/** Round-11 item 3: the `spark.graft.dedupAuditSampleBp` gate that
  * bounds the exact-truth cost of the dedup audit class. Contracts
  * under test: (a) identity at the default — an explicit 10000 changes
  * nothing; (b) a sampled candidate set is a SUBSET of the full one
  * (exactly the pairs with both endpoints in the doc sample); (c) the
  * md5 doc sample's keep-rate sits inside binomial bounds of bp/10⁴;
  * (d) the three named audits (q_minhash_accuracy, q_lsh_recall,
  * q_dedup_impact) still produce coherent rows under sampling. */
class Round11SampleSpec extends SparkSpec {

  private def withBp[A](bp: Int)(f: => A): A = {
    spark.conf.set("spark.graft.dedupAuditSampleBp", bp.toString)
    try f finally spark.conf.unset("spark.graft.dedupAuditSampleBp")
  }

  private def pairs(): Set[(Long, Long)] =
    ops.DedupAudit.candPairsForTest(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("explicit bp=10000 is byte-identical to the unset default") {
    val full = pairs()
    val explicit = withBp(10000)(pairs())
    assert(explicit == full)
  }

  test("sampled candidates are exactly the full pairs induced by the doc sample") {
    val full = pairs()
    val bp = 5000
    val sampled = withBp(bp)(pairs())
    // the sampled doc universe, recomputed with the same md5 rule
    val kept = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .filter(expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)" +
          s" AS BIGINT) * 10000 < ${bp}L * 65536"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val induced = full.filter { case (a, b) => kept(a) && kept(b) }
    assert(sampled == induced,
      s"sampled=${sampled.size} induced=${induced.size} " +
        s"full=${full.size}")
    assert(sampled.size < full.size, "sample did not shrink the pair set")
  }

  test("md5 doc-sample keep-rate is within binomial bounds") {
    val en = ops.t(spark, sf, "documents").filter(col("lang") === "en")
    val n = en.count().toDouble
    for (bp <- Seq(2500, 5000, 7500)) {
      val kept = en.filter(expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)" +
          s" AS BIGINT) * 10000 < ${bp}L * 65536")).count().toDouble
      val p = bp / 10000.0
      val sigma = math.sqrt(p * (1 - p) / n)
      assert(math.abs(kept / n - p) < 5 * sigma + 1 / n,
        s"bp=$bp keep-rate ${kept / n} vs $p (n=$n)")
    }
  }

  test("the named audits stay coherent under sampling") {
    withBp(5000) {
      val mh = SparkEntry.queries("q_minhash_accuracy")(spark, sf)
        .collect()
      assert(mh.nonEmpty)
      val lsh = SparkEntry.queries("q_lsh_recall")(spark, sf).collect()
      assert(lsh.length == 1)
      val r = lsh.head
      // tp <= n_truth and tp <= n_cand; bp columns in range
      assert(r.getLong(2) <= r.getLong(0) && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= 10000 && r.getLong(4) <= 10000)
      val imp = SparkEntry.queries("q_dedup_impact")(spark, sf).collect()
      assert(imp.nonEmpty)
      for (row <- imp) {
        assert(row.getLong(2) <= row.getLong(1), "n_dropped <= n_docs")
        assert(row.getLong(4) <= row.getLong(3), "toks_dropped <= total")
      }
    }
    val fullImp = SparkEntry.queries("q_dedup_impact")(spark, sf)
      .collect().map(_.getLong(1)).sum
    val sampImp = withBp(5000)(
      SparkEntry.queries("q_dedup_impact")(spark, sf)
        .collect().map(_.getLong(1)).sum)
    assert(sampImp < fullImp, s"sampled docs $sampImp !< full $fullImp")
  }
}
