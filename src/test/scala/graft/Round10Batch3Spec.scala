package graft

/** Round-10 §2.97 batch: brute-force twins and conservation bounds on
  * top of the DuckDB oracle — nearest-as-of recomputed per user in the
  * JVM, daily percentile probes, price-change recounts, growth-curve
  * conservation, and cross-query consistency of the kNN margin with
  * the graded top-5 list. */
class Round10Batch3Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_join_asof_nearest: brute-force twin per user") {
    import org.apache.spark.sql.functions._
    val ev = ops.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._1)).toSeq
      sorted.zipWithIndex.map { case (r, i) =>
        val prev = sorted.take(i).filter(_._3 == "purchase").map(_._4)
          .reduceOption(_ max _)
        val next = sorted.drop(i + 1).filter(_._3 == "purchase")
          .map(_._4).reduceOption(_ min _)
        val (dp, dn) = (prev.map(r._4 - _), next.map(_ - r._4))
        val side = (dp, dn) match {
          case (None, None) => None
          case (Some(_), None) => Some("prev")
          case (None, Some(_)) => Some("next")
          case (Some(a), Some(b)) => Some(if (a <= b) "prev" else "next")
        }
        r._1 -> (Seq(dp, dn).flatten.reduceOption(_ min _), side)
      }
    }.toMap
    val got = run("q_join_asof_nearest").collect().map { r =>
      r.getLong(0) -> (
        (if (r.isNullAt(2)) None else Some(r.getLong(2))),
        (if (r.isNullAt(3)) None else Some(r.getString(3))))
    }.toMap
    assert(got == expected)
  }

  test("q_daily_percentiles: brute-force probes and p50 <= p95") {
    import org.apache.spark.sql.functions._
    val vals = ops.t(spark, sf, "events")
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).map { case (d, xs) =>
      val s = xs.map(_._2).sorted
      def pct(p: Int) = s(((s.length * p + 99) / 100 - 1).max(0))
      (d, s.length.toLong, pct(50), pct(95))
    }.toSet
    val got = run("q_daily_percentiles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.forall(r => r._3 <= r._4), "p50 <= p95")
    assert(got.toSet == expected)
  }

  test("q_cumulative_users: conserves the distinct-user total") {
    import org.apache.spark.sql.functions._
    val totalUsers = ops.t(spark, sf, "events")
      .select("user_id").distinct().count()
    val rows = run("q_cumulative_users").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._2).sum == totalUsers)
    assert(rows.last._3 == totalUsers)
    assert(rows.map(_._2).scanLeft(0L)(_ + _).drop(1)
      .zip(rows.map(_._3)).forall(p => p._1 == p._2))
    assert(rows.forall(_._2 > 0), "flat days don't emit")
  }

  test("q_rank_movers: ranks are within the nation universe") {
    val n = ops.t(spark, sf, "nation").count()
    for (r <- run("q_rank_movers").collect()) {
      val (rk, prev, delta) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rk >= 1 && rk <= n && prev >= 1 && prev <= n)
      assert(math.abs(rk - prev) >= 3)
      assert(delta == prev - rk)
    }
  }

  test("q_price_changes: brute-force recount on a part sample") {
    import org.apache.spark.sql.functions._
    val li = ops.t(spark, sf, "lineitem")
      .filter(col("l_partkey") <= 50)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate")).as("us"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " div CAST(l_quantity AS BIGINT)").as("unit_c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    val expected = li.groupBy(_._1).map { case (pk, rs) =>
      val s = rs.sortBy(r => (r._4, r._2, r._3.toLong)).map(_._5).toSeq
      (pk, s.length.toLong,
        s.sliding(2).count(p => p.length == 2 && p(0) != p(1)).toLong,
        s.min, s.max)
    }.toSet
    val got = run("q_price_changes").collect()
      .filter(_.getLong(0) <= 50)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    for (r <- run("q_price_changes").collect())
      assert(r.getLong(2) < r.getLong(1), "changes < observations")
  }

  test("q_label_balance: shares and the min anchor") {
    val rows = run("q_label_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = ops.t(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._4).min == 1000L, "the smallest class is the anchor")
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 10000))
  }

  test("q_knn_margin: agrees with the graded top-5 list and is >= 0") {
    val margins = run("q_knn_margin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(margins.length == 50)
    for ((pid, n1, n2, m) <- margins) {
      assert(m >= 0L, s"cosine rank order implies margin >= 0 (pid $pid)")
      assert(n1 != n2)
    }
    // probes the two queries share (pid < 10): identical top-2 ids
    val top = run("q_knn_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 <= 2).groupBy(_._1)
      .map { case (p, xs) => p -> xs.sortBy(_._3).map(_._2).toSeq }
    for ((pid, n1, n2, _) <- margins if top.contains(pid))
      assert(top(pid) == Seq(n1, n2), s"top-2 agree for pid $pid")
  }
}
