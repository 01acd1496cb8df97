package graft

/** Round-10 §2.98 batch: cross-query and brute-force bounds — the
  * multiprobe recall dominance over single-probe LSH, point-in-time
  * conservation, linear-attribution credit accounting, ramp cohort
  * conservation, the collision sweep's monotonicity, and a JVM
  * recount of the covariance signs. */
class Round10Batch4Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_ann_multiprobe: recall dominates single-probe on every probe") {
    def top5(name: String): Map[Long, Set[Long]] =
      run(name).collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val truth = top5("q_knn_cosine")          // exact, probes pid < 10
    val single = top5("q_ann_lsh")
    val multi = top5("q_ann_multiprobe")
    assert(multi.keySet == truth.keySet)
    for ((pid, t) <- truth) {
      val rs = (single.getOrElse(pid, Set.empty) & t).size
      val rm = (multi(pid) & t).size
      assert(rm >= rs, s"probe $pid: multiprobe recall $rm < single $rs")
    }
    // and multiprobe candidates are a superset of the single-probe
    // bucket, so its top-5 cosines are >= pointwise — weaker but free:
    assert(multi.values.forall(_.size <= 5))
  }

  test("q_pit_lookup: every order lands in exactly one matrix cell") {
    val total = ops.t(spark, sf, "orders").count()
    val rows = run("q_pit_lookup").collect()
    assert(rows.map(_.getLong(2)).sum == total)
    // an as-of date before any version must resolve to 'none'; with a
    // 30-day lookback such orders exist in every fixture month 1
    assert(rows.exists(_.getString(0) == "none"))
  }

  test("q_linear_attribution: credit conserves up to per-purchase flooring") {
    import org.apache.spark.sql.functions._
    val ev = ops.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val types = Seq("click", "error", "signup", "view")
    var expected = types.map(_ -> (0L, 0L)).toMap
    for ((_, rows) <- ev.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._4, r._2)).toSeq
      for (i <- sorted.indices if sorted(i)._3 == "purchase") {
        val prior = sorted.take(i).filter(_._3 != "purchase")
        if (prior.nonEmpty) {
          val n = prior.size.toLong
          for (tp <- types) {
            val c = prior.count(_._3 == tp).toLong
            val (np, cr) = expected(tp)
            expected += tp -> (np + (if (c > 0) 1L else 0L),
              cr + c * 1000000L / n)
          }
        }
      }
    }
    val got = run("q_linear_attribution").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected.filter(t => t._2._1 > 0 || t._2._2 > 0))
  }

  test("q_item_ramp: every cohort part sells in its own first month") {
    val rows = run("q_item_ramp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    for ((_, off, nParts, nSelling, cents) <- rows) {
      assert(off >= 0 && off <= 2)
      assert(nSelling <= nParts)
      assert(cents > 0)
      if (off == 0) assert(nSelling == nParts,
        "offset 0 = the cohort-defining month")
    }
    val nPartsTotal = ops.t(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.filter(_._2 == 0).map(_._3).sum == nPartsTotal)
  }

  test("q_trend_reversal: JVM double covariance agrees on every sign") {
    import org.apache.spark.sql.functions._
    val cust = ops.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("x"))
      .join(ops.t(spark, sf, "orders").groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("y")),
        col("c_custkey") === col("o_custkey"))
      .select("c_mktsegment", "x", "y").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def covSign(xs: Seq[(Long, Long)]): Long = {
      val n = xs.size.toDouble
      val mx = xs.map(_._1).sum / n
      val my = xs.map(_._2).sum / n
      math.signum(xs.map { case (x, y) =>
        (x - mx) * (y - my) }.sum).toLong
    }
    val pooled = covSign(cust.map(r => (r._2, r._3)).toSeq)
    val perSeg = cust.groupBy(_._1).map { case (sg, rs) =>
      sg -> covSign(rs.map(r => (r._2, r._3)).toSeq) }
    for (r <- run("q_trend_reversal").collect()) {
      assert(r.getLong(2) == perSeg(r.getString(0)))
      assert(r.getLong(3) == pooled)
      assert(r.getBoolean(4) == (r.getLong(2) != r.getLong(3)))
    }
  }

  test("q_hash_collisions: bigger tables collide less, vocab constant") {
    val rows = run("q_hash_collisions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 12L, 16L))
    assert(rows.map(_._3).distinct.size == 1, "same vocab at every k")
    assert(rows.sliding(2).forall(p => p(0)._5 >= p(1)._5),
      "collisions non-increasing in table size")
    for ((_, m, n, used, coll, _, maxLoad) <- rows) {
      assert(used <= m && used <= n)
      assert(coll == n - used)
      assert(maxLoad >= (n + m - 1) / m, "max load >= ceil(n/m)")
    }
  }

  test("q_autocomplete: per-prefix ranking recounted from raw counts") {
    import org.apache.spark.sql.functions._
    val counts = ops.t(spark, sf, "documents")
      .filter(col("lang") === "en")
      .select(explode(ops.tokens(col("text"))).as("token"))
      .filter(length(col("token")) >= 3)
      .groupBy("token").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 >= 5)
    val expected = counts.groupBy(_._1.take(2)).toSeq.flatMap {
      case (p, xs) => xs.sortBy(t => (-t._2, t._1)).take(3).zipWithIndex
        .map { case ((tok, n), i) => (p, i + 1L, tok, n) }
    }.toSet
    val got = run("q_autocomplete").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == expected)
  }
}
