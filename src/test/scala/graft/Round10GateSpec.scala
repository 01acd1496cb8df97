package graft

import org.apache.spark.sql.functions._

/** Round-10 items 5/6: the two new adversarial-density gates.
  *
  *  - `spark.graft.basketMaxWidth`: orders wider than W distinct parts
  *    leave the basket universe (pairs, marginals, N). Forced equality
  *    at W = 64 on the fixture (max width 7), and wide-order exclusion
  *    semantics on a crafted fixture with one 200-part order.
  *  - q_near_dup_sources under `spark.graft.dedupMaxPairsPerDoc`: the
  *    source matrix folds over the LSH cluster membership instead of
  *    the exact pair list. Verified against an INDEPENDENT spec-side
  *    fold over the same gated cluster labels (q_dedup_minhash's gated
  *    output — identical collision graph by construction).
  */
class Round10GateSpec extends SparkSpec {

  private def rows(name: String, dir: String = sf): Set[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toSeq.mkString("|")).toSet

  test("basketMaxWidth=64 leaves the fixture basket family bit-equal") {
    val basePairs = rows("q_basket_pairs")
    val baseCross = rows("q_cross_sell")
    spark.conf.set("spark.graft.basketMaxWidth", "64")
    try {
      assert(rows("q_basket_pairs") == basePairs)
      assert(rows("q_cross_sell") == baseCross)
    } finally spark.conf.unset("spark.graft.basketMaxWidth")
  }

  // one 200-part order (the adversarial basket: C(200,2) ≈ 20k pairs
  // from a single order) + three 2-part orders sharing parts (1, 2)
  private lazy val wideDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wide").toString
    val wide = spark.range(200).selectExpr(
      "CAST(1 AS BIGINT) AS l_orderkey", "id + 1000 AS l_partkey")
    val small = spark.range(3).selectExpr("id + 2 AS o")
      .selectExpr("o AS l_orderkey",
        "explode(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS l_partkey")
    wide.unionAll(small).selectExpr(
        "l_orderkey", "l_partkey", "CAST(1 AS BIGINT) AS l_suppkey",
        "CAST(1 AS INT) AS l_linenumber", "CAST(1.0 AS DOUBLE) AS l_quantity",
        "CAST(10.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount", "CAST(0.0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag", "'O' AS l_linestatus",
        "TIMESTAMP '1996-01-01 00:00:00' AS l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("basketMaxWidth drops a pathological order from the universe") {
    // ungated: the wide order stays in N (4 orders) but its pairs fall
    // to the support>=3 filter; the (1,2) lift sees N=4 → 1_333_333
    val ungated = SparkEntry.queries("q_basket_pairs")(spark, wideDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(ungated.toSeq == Seq((1L, 2L, 1333333L)))
    spark.conf.set("spark.graft.basketMaxWidth", "64")
    try {
      // gated: the wide order leaves pairs AND N (3 orders) → lift 10⁶
      val gated = SparkEntry.queries("q_basket_pairs")(spark, wideDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
      assert(gated.toSeq == Seq((1L, 2L, 1000000L)))
    } finally spark.conf.unset("spark.graft.basketMaxWidth")
  }

  test("gated q_near_dup_sources equals an independent cluster fold") {
    spark.conf.set("spark.graft.dedupMaxPairsPerDoc", "0")
    try {
      // the same gate flips q_dedup_minhash into cluster-representative
      // mode over the SAME md5-band collision graph — its labels are the
      // independent ground truth for the source-matrix fold
      val labels = ops.Sketches.qDedupMinhash(spark, sf)
        .select("doc_id", "cluster_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.nonEmpty, "density gate did not trip on the fixture")
      val srcOf = ops.t(spark, sf, "documents")
        .select("doc_id", "source").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val byCluster = labels.toSeq.groupBy(_._2)
        .view.mapValues(_.map(p => srcOf(p._1))).toMap
      val expected = collection.mutable.Map[(String, String), Long]()
      for ((_, srcs) <- byCluster) {
        val counts = srcs.groupBy(identity).view.mapValues(_.size.toLong)
        val keys = counts.keys.toSeq.sorted
        for (i <- keys.indices; j <- i until keys.size) {
          val k = (keys(i), keys(j))
          val n = if (i == j) counts(keys(i)) * (counts(keys(i)) - 1) / 2
                  else counts(keys(i)) * counts(keys(j))
          if (n > 0) expected(k) = expected.getOrElse(k, 0L) + n
        }
      }
      val got = CrossSourceAccess.nearDupSources(spark, sf).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == expected.toMap,
        s"gated matrix diverged: got ${got.toSeq.sorted.take(5)} " +
          s"expected ${expected.toSeq.sorted.take(5)}")
    } finally spark.conf.unset("spark.graft.dedupMaxPairsPerDoc")
  }

  test("q_near_dup_sources gate is OFF by default (exact path)") {
    // no conf: the exact pair fold — identical to the oracle contract
    val exact = rows("q_near_dup_sources")
    assert(exact.nonEmpty)
  }
}

/** Package-bridge for the spec (qNearDupSources lives behind the
  * SparkEntry indirection; this keeps the call typed). */
object CrossSourceAccess {
  def nearDupSources(s: org.apache.spark.sql.SparkSession,
                     dir: String): org.apache.spark.sql.DataFrame =
    ops.CrossSource.qNearDupSources(s, dir)
}
