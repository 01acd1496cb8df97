package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/** Round-5 (§2.17) operator checks: non-vacuity of every discriminating
  * predicate, independent in-memory cross-checks of the exact-arithmetic
  * claims, and plan-shape assertions for the scale notes. */
class Round5Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def plan(name: String): SparkPlan =
    run(name).queryExecution.sparkPlan

  test("q_contamination: splits are disjoint and hits are consistent") {
    val rows = run("q_contamination").collect()
    assert(rows.nonEmpty, "no contaminated docs at test SF — vacuous")
    for (r <- rows) {
      assert(r.getLong(0) % 2 == 0, s"train_doc ${r.getLong(0)} is odd")
      val (nSh, nEv, nHits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSh >= 1 && nEv >= 1)
      assert(nHits >= nSh && nHits >= nEv,
        s"pair count $nHits below distinct counts ($nSh, $nEv)")
    }
    val all = ops.t(spark, sf, "documents")
      .filter("doc_id % 2 = 0").count()
    assert(rows.length < all, "every train doc contaminated — vacuous")
  }

  test("q_ngram_lm: top-3 per context, probabilities bounded") {
    val rows = run("q_ngram_lm").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    for ((_, grp) <- rows.groupBy(_._1)) {
      assert(grp.length <= 3)
      for ((_, _, nPair, nCtx, prob) <- grp) {
        assert(nPair <= nCtx)
        assert(prob > 0 && prob <= 1)
      }
    }
    assert(rows.map(_._1).distinct.length > 10, "too few contexts")
  }

  test("q_cooccur_pmi: support filter discriminates, df bounds hold") {
    val rows = run("q_cooccur_pmi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((t1, t2, nAb, df1, df2) <- rows) {
      assert(t1 < t2, s"unordered pair ($t1, $t2)")
      assert(nAb >= 5 && nAb <= df1 && nAb <= df2)
    }
  }

  test("q_kmeans_iter: members partition the corpus, means are bounded") {
    val rows = run("q_kmeans_iter").collect()
    val nVec = ops.t(spark, sf, "embeddings").count()
    val byCid = rows.groupBy(_.getLong(0))
    assert(byCid.keySet.forall(c => c >= 0 && c < 16))
    // each emitted centroid has all 64 dims and one consistent size
    for ((cid, rs) <- byCid) {
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to 64L),
        s"centroid $cid missing dims")
      assert(rs.map(_.getLong(3)).distinct.length == 1)
    }
    assert(byCid.map { case (_, rs) => rs.head.getLong(3) }.sum == nVec,
      "cluster sizes do not partition the corpus")
    assert(byCid.size > 4, s"only ${byCid.size} clusters non-empty")
  }

  test("q_kmeans_iter plan: assignment is in-projection (no window)") {
    assert(plan("q_kmeans_iter").collect {
      case w: WindowExec => w
    }.isEmpty, "nearest-centroid must be argmin in a projection")
  }

  test("q_anomaly_mad: all kept rows clear the 3-sigma-equivalent cut") {
    val rows = run("q_anomaly_mad").collect()
    assert(rows.nonEmpty, "no MAD outliers at test SF — vacuous")
    val all = ops.t(spark, sf, "events").count()
    assert(rows.length < all / 10, "threshold too loose")
    for (r <- rows) {
      assert(r.getDouble(4) > 0, "MAD must be positive for kept rows")
      assert(r.getDouble(5) > 3.0,
        s"robust_z ${r.getDouble(5)} not above the cut")
    }
  }

  test("q_anomaly_mad medians match an in-memory exact computation") {
    val vals = ops.t(spark, sf, "events")
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2)
      else (BigDecimal(s(n / 2 - 1)) + BigDecimal(s(n / 2))).toDouble / 2
    }
    val want = vals.groupBy(_._1).map { case (t, vs) =>
      t -> med(vs.map(_._2).toIndexedSeq)
    }
    val got = run("q_anomaly_mad").collect()
      .map(r => r.getString(1) -> r.getDouble(3)).toMap
    for ((t, m) <- got)
      assert(math.abs(m - want(t)) < 1e-9,
        s"median for $t: got $m want ${want(t)}")
  }

  test("q_corr_matrix agrees with built-in corr to 4 decimals") {
    import org.apache.spark.sql.functions.corr
    val li = ops.t(spark, sf, "lineitem")
    val ref = li.agg(
      corr("l_quantity", "l_extendedprice"),
      corr("l_quantity", "l_discount"),
      corr("l_extendedprice", "l_discount")).head()
    val want = Map("qty_price" -> ref.getDouble(0),
      "qty_disc" -> ref.getDouble(1), "price_disc" -> ref.getDouble(2))
    val got = run("q_corr_matrix").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    for ((k, v) <- got) {
      assert(math.abs(v) <= 1.0)
      assert(math.abs(v - want(k)) < 1e-3,
        s"$k: exact-moment $v vs streaming ${want(k)}")
    }
  }

  test("q_split_manifest: partitions all docs, train dominates") {
    val rows = run("q_split_manifest").collect()
    val splits = rows.map(_.getString(0)).distinct.toSet
    assert(splits == Set("train", "val", "test"),
      s"unexpected splits $splits")
    val byKey = rows.groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(2)).sum }
    assert(byKey.values.sum == ops.t(spark, sf, "documents").count())
    assert(byKey("train") > byKey("val") && byKey("train") > byKey("test"))
  }

  test("q_pagerank: mass is conserved up to floor-div loss") {
    val rows = run("q_pagerank").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((node, isSupp, deg, r) <- rows) {
      assert(isSupp == (node % 2 == 1))
      assert(deg >= 1)
      assert(r >= 150000L, s"rank $r below the teleport floor")
    }
    val n = rows.length.toLong
    val total = rows.map(_._4).sum
    // each iteration loses < 1 unit per (edge, node) to floor division;
    // total mass stays within a few percent of n * 1e6
    assert(total <= n * 1000000L)
    assert(total > n * 900000L, s"mass $total too low for $n nodes")
    // suppliers are rarer and therefore hubs: the max supplier rank
    // should exceed the max customer rank
    val supMax = rows.filter(_._2).map(_._4).max
    val cusMax = rows.filterNot(_._2).map(_._4).max
    assert(supMax > cusMax, "supplier hubs should out-rank customers")
  }

  test("q_skyline matches brute-force Pareto dominance") {
    val parts = ops.t(spark, sf, "part")
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 100)))
    val want = parts.filter { case (_, sz, pc) =>
      !parts.exists { case (_, sz2, pc2) =>
        pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.map(_._1).toSet
    val got = run("q_skyline").collect().map(_.getLong(0)).toSet
    assert(got == want, s"skyline mismatch: got $got want $want")
    assert(got.nonEmpty && got.size < parts.length / 10,
      "frontier should be a small strict subset")
  }

  test("q_islands: streaks are maximal, disjoint, and discriminating") {
    val rows = run("q_islands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no >=7-day streaks at test SF — vacuous")
    for ((_, grp) <- rows.groupBy(_._1)) {
      val sorted = grp.sortBy(_._2)
      for (Array((_, s1, l1), (_, s2, _)) <- sorted.sliding(2)
             .map(_.toArray).filter(_.length == 2)) {
        assert(s1 + l1 < s2, "islands overlap or touch — not maximal")
      }
    }
    // independent in-memory islands: the >=7 filter must reject SOME
    // island, and the kept ones must match exactly
    val days = ops.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = days.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val sorted = ds.map(_._2).distinct.sorted
      sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((su, st, ln) :: rest, d) if d == st + ln =>
          (su, st, ln + 1) :: rest
        case (acc, d) => (u, d, 1L) :: acc
      }
    }
    assert(rows.toSet == want.filter(_._3 >= 7).toSet,
      "islands disagree with in-memory computation")
    assert(want.exists(_._3 < 7),
      "no short island exists — the >=7 filter is vacuous")
  }

  test("q_gini matches an in-memory Lorenz computation per segment") {
    val spend = ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice*100) AS BIGINT) c")
      .groupBy("o_custkey").sum("c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seg = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = spend.toSeq.map { case (ck, sp) => (seg(ck), ck, sp) }
      .groupBy(_._1).map { case (sg, xs) =>
        val s = xs.sortBy(x => (x._3, x._2)).map(_._3)
        val n = s.length.toLong
        val tot = s.sum
        val ws = s.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
        sg -> BigDecimal((2 * ws - (n + 1) * tot).toDouble / (n * tot))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val got = run("q_gini").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == want.keySet)
    for ((sg, g) <- got) {
      assert(g >= 0.0 && g < 1.0, s"$sg gini $g out of range")
      assert(math.abs(g - want(sg)) < 1e-9, s"$sg: got $g want ${want(sg)}")
    }
  }

  test("q_autocorr: bounded correlations over the full day range") {
    val rows = run("q_autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val nDays = ops.t(spark, sf, "events")
      .selectExpr("unix_micros(ts) div 86400000000 AS d")
      .distinct().count()
    for ((t, n, r) <- rows) {
      assert(r >= -1.0 && r <= 1.0, s"$t autocorr $r out of range")
      assert(n >= 1 && n < nDays, s"$t pair count $n vs $nDays days")
    }
  }

  test("q_markov: rows form a stochastic matrix") {
    val rows = run("q_markov").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    for ((from, grp) <- rows.groupBy(_._1)) {
      assert(grp.map(_._3).sum == grp.head._4,
        s"$from transition counts don't sum to the total")
      val p = grp.map(_._5).sum
      assert(math.abs(p - 1.0) < 1e-3, s"$from row sums to $p")
    }
  }

  test("q_contamination plan: shingle-keyed equi-join, no nested loop") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = plan("q_contamination")
    assert(p.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, "cross-split overlap must be an equi-join on the shingle")
  }

  test("q_autocorr plan: day pairing is a join, not a window") {
    assert(plan("q_autocorr").collect {
      case w: WindowExec => w
    }.isEmpty, "lag-1 pairing should be the day+1 equi-join")
  }

  test("q_matmul matches an in-memory dense multiply") {
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey % 50 AS i", "l_partkey % 40 AS j",
        "CAST(l_quantity AS BIGINT) AS v",
        "l_suppkey % 30 AS kk", "CAST(l_linenumber AS BIGINT) AS w")
      .collect()
    val a = Array.ofDim[Long](50, 40)
    val b = Array.ofDim[Long](40, 30)
    for (r <- li) {
      a(r.getLong(0).toInt)(r.getLong(1).toInt) += r.getLong(2)
      b(r.getLong(1).toInt)(r.getLong(3).toInt) += r.getLong(4)
    }
    val want = (for {
      i <- 0 until 50; kk <- 0 until 30
      v = (0 until 40).map(j => a(i)(j) * b(j)(kk)).sum
      if v != 0
    } yield (i.toLong, kk.toLong) -> v).toMap
    val got = run("q_matmul").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, "sparse join-multiply disagrees with dense truth")
  }

  test("q_source_binary digests match java.nio ground truth") {
    val got = SparkEntry.queries("q_source_binary")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    val dirFiles = new java.io.File(sf).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(dirFiles.nonEmpty && got.size == dirFiles.length)
    for (f <- dirFiles) {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      // digest contract (round 9): md5 over the uppercase-hex spelling of
      // the bytes — the DuckDB-1.0-portable form (no md5(BLOB) there)
      val hexStr = bytes.map("%02X".format(_)).mkString
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(hexStr.getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString
      assert(got(f.getName) == (bytes.length.toLong, digest),
        s"${f.getName}: ${got(f.getName)} vs (${bytes.length}, $digest)")
    }
  }

  test("q_topk_custom: custom exec planned, no window/sort, matches window spelling") {
    val p = plan("q_topk_custom")
    assert(p.collect {
      case e: graft.plans.TopKPerGroupExec => e
    }.nonEmpty, "TopKStrategy should plan the custom operator")
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "custom top-k must not fall back to a window")
    // equivalence against the built-in window spelling
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val want = ops.t(spark, sf, "events")
      .select("event_type", "event_id", "value")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val got = run("q_topk_custom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, "custom exec disagrees with the window spelling")
  }

  test("Misra-Gries guarantee holds in the lossy regime (>k distinct)") {
    val s = spark; import s.implicits._
    // zipf-ish skew over 40 distinct tokens, well beyond k=16 counters
    val data = (1 to 40).flatMap(i => Seq.fill(1200 / i)(s"t$i"))
    val got = data.toDF("tok").repartition(8)
      .agg(functions.MisraGries.heavyHitters(org.apache.spark.sql
        .functions.col("tok"), 16).as("hh"))
      .selectExpr("explode(hh) AS e")
      .selectExpr("e.token", "e.c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = data.size.toLong
    // every item above TWICE the threshold must be recovered, and no
    // reported counter may exceed the true frequency
    for ((t, f) <- exact if f > 2 * n / 17)
      assert(got.contains(t), s"guaranteed hitter $t (f=$f) missing")
    for ((t, c) <- got)
      assert(c <= exact(t), s"$t counter $c exceeds true ${exact(t)}")
    assert(got.nonEmpty && got.size <= 16)
  }

  test("TPC-H twins: top-k plans use TakeOrderedAndProject, revenue ranked") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    for (q <- Seq("q_tpch_q3", "q_tpch_q10")) {
      assert(plan(q).collect {
        case e: TakeOrderedAndProjectExec => e
      }.nonEmpty, s"$q should take its top-k without a full global sort")
      val rev = run(q).collect().map(_.getAs[Double]("revenue")).toSeq
      assert(rev.nonEmpty && rev.forall(_ > 0))
    }
    val q5 = run("q_tpch_q5").collect()
    assert(q5.length >= 1 && q5.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q_pagerank plan: degree rides the pinned edges — 1 join per iter") {
    // Round 6 folded the out-degree onto the pinned edge list, so each
    // unrolled iteration is ONE edges⋈ranks equi-join; with the output
    // re-attach join that is exactly 3 joins in the whole plan (the
    // former shape paid 2 joins per iteration plus the output join, all
    // against per-iteration broadcasts of node-sized state).
    val joins = plan("q_pagerank").collect {
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.length == 3,
      s"expected 3 joins (2 iterations + output), got ${joins.length}")
  }
}
