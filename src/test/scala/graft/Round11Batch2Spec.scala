package graft

import org.apache.spark.sql.functions._

/** Round-11 second widening batch: co-movement / outlier / consistency
  * statistics, lexical-statistics staples, and the MERGE-apply
  * warehouse staple — brute-force twins from collected fixture rows. */
class Round11Batch2Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val daily: Map[String, Seq[(Long, Long)]] =
    ops.t(spark, sf, "events")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "day")
      .agg(sum("cents").cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap

  test("q_rolling_corr matches a windowed brute force") {
    val x = daily("purchase").toMap
    val y = daily("view").toMap
    val days = x.keySet.intersect(y.keySet).toSeq.sorted
    val got = run("q_rolling_corr").collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.keySet == days.toSet)
    for (d <- days) {
      val win = days.filter(w => w >= d - 29 && w <= d)
      val n = win.length.toDouble
      assert(got(d)._1 == win.length)
      if (win.length >= 5) {
        val xs = win.map(w => x(w).toDouble)
        val ys = win.map(w => y(w).toDouble)
        val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum -
          xs.sum * ys.sum
        val den = math.sqrt(n * xs.map(a => a * a).sum -
          xs.sum * xs.sum) *
          math.sqrt(n * ys.map(a => a * a).sum - ys.sum * ys.sum)
        if (den > 0) {
          val e = math.round(num / den * 1000)
          assert(math.abs(got(d)._2.get - e) <= 1,
            s"day=$d got ${got(d)._2} expected $e")
        }
      } else assert(got(d)._2.isEmpty)
    }
  }

  test("q_grubbs identifies the exact extreme event per type") {
    val rows = ops.t(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = run("q_grubbs").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    for ((tpe, g) <- rows.groupBy(_._1)) {
      val n = g.length.toLong
      val sSum = g.map(_._3).sum
      // exact argmax of |x·n − S|, ties to the smaller event_id
      val best = g.map(e => (BigInt(e._3) * n - sSum).abs -> e._2)
        .sortBy { case (dev, id) => (-dev, id) }.head
      assert(got(tpe)._1 == n && got(tpe)._2 == best._2,
        s"$tpe: got ${got(tpe)} expected id ${best._2}")
      val mean = sSum.toDouble / n
      val varS = g.map(e => (e._3 - mean) * (e._3 - mean)).sum / (n - 1)
      val e = math.round(
        (best._1.toDouble / n) / math.sqrt(varS) * 1000)
      assert(math.abs(got(tpe)._3 - e) <= 1)
    }
  }

  test("q_partial_corr is consistent with q_corr_matrix's pairwise r") {
    val row = run("q_partial_corr").collect().head
    val corr = run("q_corr_matrix").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(row.getDouble(1) == corr("qty_price"),
      "r_xy must equal the corr-matrix qty_price entry")
    val (rxy, rxz, ryz) =
      (corr("qty_price"), corr("qty_disc"), corr("price_disc"))
    val e = (rxy - rxz * ryz) /
      (math.sqrt(1 - rxz * rxz) * math.sqrt(1 - ryz * ryz))
    // 4-dp twins recompose to ~3 dp of the exact partial
    assert(math.abs(row.getDouble(2) - e) < 5e-4)
  }

  test("q_cronbach matches a brute-force variance decomposition") {
    val g = ops.t(spark, sf, "events")
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("user_id", "event_type")
      .agg(sum("cents").cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = g.map(_._1).distinct
    val uN = users.length.toDouble
    val types = g.map(_._2).distinct
    def variance(vs: Seq[Long]): Double = {
      // population variance over ALL users, absents = 0
      val s = vs.map(_.toDouble).sum
      val ss = vs.map(v => v.toDouble * v).sum
      ss / uN - (s / uN) * (s / uN)
    }
    val sumVarI = types.map(t =>
      variance(g.filter(_._2 == t).map(_._3).toSeq)).sum
    val varTot = variance(
      g.groupBy(_._1).values.map(_.map(_._3).sum).toSeq)
    val k = types.length.toDouble
    val e = math.round(k / (k - 1) * (1 - sumVarI / varTot) * 1000)
    val row = run("q_cronbach").collect().head
    assert(row.getLong(0) == types.length &&
      row.getLong(1) == users.length)
    assert(math.abs(row.getLong(2) - e) <= 1,
      s"alpha got ${row.getLong(2)} expected $e")
  }

  test("q_good_turing: identities over the frequency-of-frequencies") {
    val rows = run("q_good_turing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byR = rows.map(r => r._1 -> r._2).toMap
    // Σ_r r·N_r = total occurrences; recompute from the corpus
    val occ = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .select(expr("filter(split(lower(text), ' '), x -> x <> '')"))
      .collect().map(_.getSeq[String](0).length.toLong).sum
    assert(rows.map(r => r._1 * r._2).sum == occ)
    for ((r, nR, rstar) <- rows) {
      val expected = byR.get(r + 1)
        .map(n1 => (r + 1) * n1 * 1000 / nR).getOrElse(0L)
      assert(rstar == expected, s"r=$r")
    }
  }

  test("q_yule_k matches a direct computation per source") {
    val counts = ops.t(spark, sf, "documents")
      .select(col("source"), explode(expr(
        "filter(split(lower(text), ' '), x -> x <> '')")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val got = run("q_yule_k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    for ((src, g) <- counts.groupBy(_._1)) {
      val n = g.map(_._2).sum
      val sc2 = g.map(x => BigInt(x._2) * x._2).sum
      val e = ((sc2 - n) * BigInt(10000000) / (BigInt(n) * n)).toLong
      assert(got(src) == ((n, g.length.toLong, e)), s"src=$src")
    }
  }

  test("q_merge_upsert: ops partition customers and totals conserve") {
    val rows = run("q_merge_upsert").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.length == rows.length,
      "one post-merge row per customer")
    // total order count and cents conserve against the raw table
    val (nAll, centsAll) = {
      val a = ops.t(spark, sf, "orders")
        .agg(count(lit(1)),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
        .collect().head
      (a.getLong(0), a.getLong(1))
    }
    assert(rows.map(_._3).sum == nAll)
    assert(rows.map(_._5).sum == centsAll)
    // op taxonomy: inserts have no pre-1997 orders; keeps no 1997+ ones
    val pre = ops.t(spark, sf, "orders")
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val post = ops.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    for ((ck, op, _, _, _) <- rows) op match {
      case "insert" => assert(!pre(ck) && post(ck))
      case "keep" => assert(pre(ck) && !post(ck))
      case "update" => assert(pre(ck) && post(ck))
    }
  }

  test("q_delete_propagation matches a brute FK-chain recomputation") {
    def kept(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 4), 16) * 10000 <
        100L * 65536
    }
    val cust = ops.t(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    val fCust = cust.filter(kept).toSet
    val orders = ops.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fOrd = orders.filter(o => fCust(o._2)).map(_._1).toSet
    val li = ops.t(spark, sf, "lineitem").select("l_orderkey")
      .collect().map(_.getLong(0))
    val ev = ops.t(spark, sf, "events").select("user_id")
      .collect().map(_.getLong(0))
    val expect = Map(
      "customer" -> (cust.length.toLong, fCust.size.toLong),
      "orders" -> (orders.length.toLong, fOrd.size.toLong),
      "lineitem" -> (li.length.toLong, li.count(fOrd).toLong),
      "events" -> (ev.length.toLong, ev.count(kept).toLong))
    val got = run("q_delete_propagation").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    assert(expect("customer")._2 > 0, "forget set must be non-empty")
  }
}
