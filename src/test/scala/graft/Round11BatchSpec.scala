package graft

import org.apache.spark.sql.functions._

/** Round-11 widening batch (§2.105/§2.106): brute-force twins of the
  * paired/correlation nonparametrics, the day-spine drift readouts,
  * and the collocation/LM scores — each query's statistic recomputed
  * directly from collected fixture rows in plain Scala. */
class Round11BatchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val pairs: Array[(Long, Long)] = {
    // per-customer (1996 cents, 1997 cents), both years present
    val rows = ops.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"),
        (col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
          .cast("long").as("y97"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).values
      .filter(g => g.exists(_._3 == 1L) && g.exists(_._3 == 0L))
      .map(g => (g.filter(_._3 == 0L).map(_._2).sum,
        g.filter(_._3 == 1L).map(_._2).sum))
      .toArray
  }

  test("q_spearman matches a direct midrank-Pearson computation") {
    val rows = ops.t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def midrank2(vs: Seq[Long]): Map[Long, Long] = {
      // doubled midrank of each distinct value: 2·(#smaller) + cnt + 1
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = cnt.keys.toSeq.sorted
      var before = 0L
      sorted.map { v =>
        val r = 2 * before + cnt(v) + 1; before += cnt(v); v -> r
      }.toMap
    }
    val expect = rows.groupBy(_._1).map { case (flag, g) =>
      val u = midrank2(g.map(_._2).toSeq)
      val v = midrank2(g.map(_._3).toSeq)
      val n = g.length.toDouble
      val us = g.map(x => u(x._2).toDouble)
      val vs = g.map(x => v(x._3).toDouble)
      val (su, sv) = (us.sum, vs.sum)
      val suu = us.map(x => x * x).sum
      val svv = vs.map(x => x * x).sum
      val suv = us.zip(vs).map { case (a, b) => a * b }.sum
      val rho = (n * suv - su * sv) /
        (math.sqrt(n * suu - su * su) * math.sqrt(n * svv - sv * sv))
      flag -> math.round(rho * 1000)
    }
    val got = run("q_spearman").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((flag, e) <- expect)
      assert(math.abs(got(flag) - e) <= 1, // FP-order slack on the twin
        s"flag=$flag got ${got(flag)} expected $e")
    // range sanity only — at sf0.001 per-flag samples are small enough
    // that unit-price variance can push a flag's rho slightly negative
    assert(got.values.forall(v => v >= -1000 && v <= 1000))
  }

  test("q_wilcoxon_signed: rank-sum identity and brute-force W+") {
    val d = pairs.map { case (pre, post) => post - pre }.filter(_ != 0)
    val n = d.length.toLong
    // doubled midranks of |d|
    val cnt = d.map(math.abs).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val sorted = cnt.keys.toSeq.sorted
    var before = 0L
    val r2 = sorted.map { v =>
      val r = 2 * before + cnt(v) + 1; before += cnt(v); v -> r
    }.toMap
    val w2p = d.filter(_ > 0).map(x => r2(math.abs(x))).sum
    val row = run("q_wilcoxon_signed").collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == w2p, s"W2+ ${row.getLong(1)} vs $w2p")
    assert(row.getLong(1) + row.getLong(2) == n * (n + 1),
      "W2+ + W2- must equal n(n+1)")
  }

  test("q_sign_test counts match the brute pairing") {
    val up = pairs.count { case (a, b) => b > a }.toLong
    val down = pairs.count { case (a, b) => b < a }.toLong
    val zero = pairs.count { case (a, b) => a == b }.toLong
    val row = run("q_sign_test").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((up, down, zero)))
    assert(row.getLong(3) ==
      (up - down) * (up - down) * 1000 / (up + down))
  }

  test("q_friedman: rank sums cover b·k(k+1)/2 and stat is coherent") {
    val rows = run("q_friedman").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    val b = rows.head._2
    assert(rows.forall(_._2 == b), "complete blocks: equal n_blocks")
    // Σ over priorities of rank sums = b · k(k+1)/2 (ranks 1..5 per block)
    assert(rows.map(_._3).sum == b * 15)
    assert(rows.map(_._4).distinct.length == 1, "one shared χ²F")
    assert(rows.head._4 >= 0)
  }

  test("q_page_hinkley matches a sequential recomputation per type") {
    val daily = ops.t(spark, sf, "events")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "day")
      .agg(sum("cents").cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tpe, g) =>
      val xs = g.sortBy(_._2).map(x => (x._2, x._3))
      var s = 0L; var t = 0L; var m = 0L; var mMin = 0L
      var best = 0L; var bestDay = Long.MaxValue
      for ((day, x) <- xs) {
        t += 1; s += x
        val num = x * t - s
        val dev = if (num >= 0) num * 1000 / t else -((-num) * 1000 / t)
        m += dev
        if (m < mMin) mMin = m
        val rise = m - mMin
        if (rise > best) { best = rise; bestDay = day }
      }
      // first day attaining the max (ties keep the earliest)
      tpe -> (xs.length.toLong, best, bestDay)
    }
    val got = run("q_page_hinkley").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    for ((tpe, (n, ph, day)) <- expect) {
      assert(got(tpe)._1 == n && got(tpe)._2 == ph,
        s"$tpe: got ${got(tpe)} expected ($n, $ph, $day)")
      if (ph > 0) assert(got(tpe)._3 == day)
    }
  }

  test("q_theil_u matches the naive-forecast ratio per type") {
    val daily = ops.t(spark, sf, "events")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "day")
      .agg(sum("cents").cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = run("q_theil_u").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((tpe, g) <- daily.groupBy(_._1) if g.length >= 2) {
      val xs = g.sortBy(_._2).map(_._3)
      val steps = xs.sliding(2).filter(_.length == 2).toSeq
      val sse = steps.map { w =>
        BigInt(w(1) - w(0)) * BigInt(w(1) - w(0)) }.sum
      val ssx = steps.map(w => BigInt(w(1)) * w(1)).sum
      val (gn, gu) = got(tpe)
      assert(gn == xs.length - 1)
      assert(gu == math.round(
        math.sqrt(sse.toDouble / ssx.toDouble) * 1000))
    }
  }

  test("q_pmi: floor respected and a hand-checked bigram agrees") {
    val rows = run("q_pmi").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2._1 >= 5), "count floor")
    for ((_, (cab, ca, cb, _)) <- rows.take(20))
      assert(cab <= ca && cab <= cb, "marginals bound the joint")
    // hand recomputation for the single highest-count bigram
    val bg = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .select(expr("split(lower(text), ' ')").as("toks"))
      .collect().flatMap(_.getSeq[String](0).sliding(2).collect {
        case Seq(a, b) => (a, b)
      })
    val nAll = bg.length.toLong
    val top = bg.groupBy(identity).view.mapValues(_.length.toLong)
      .maxBy(_._2)
    val topA = bg.count(_._1 == top._1._1).toLong
    val topB = bg.count(_._2 == top._1._2).toLong
    val e = math.round(math.log(
      top._2.toDouble * nAll / (topA.toDouble * topB)) * 1e6)
    assert(rows.toMap.apply(top._1) == ((top._2, topA, topB, e)))
  }

  test("q_perplexity: integer identity and a hand-scored doc") {
    val rows = run("q_perplexity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((_, n, nll, perTok) <- rows) {
      assert(nll > 0, "add-1 LM NLL is positive")
      assert(perTok == nll / (n * 1000), "integer division identity")
    }
    // hand-score one doc against the corpus LM
    val occ = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .select(col("doc_id"), expr(
        "filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val counts = occ.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val nOcc = counts.values.sum
    val v = counts.size.toLong
    val lpU = counts.map { case (t, c) =>
      t -> math.round(math.log((c + 1).toDouble / (nOcc + v)) * 1e6)
    }
    val (docId, toks) = occ.maxBy(_._2.length)
    val nll = -toks.map(lpU).sum
    val got = rows.find(_._1 == docId).get
    assert(got._2 == toks.length && got._3 == nll)
  }
}
