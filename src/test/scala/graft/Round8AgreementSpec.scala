package graft

/** Round-8 §2.57 operator checks: Cohen's kappa, per-class F1, and MCC
  * against in-JVM brute force over the same deterministic raters. */
class Round8AgreementSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_cohens_kappa matches integer brute force and is bounded") {
    val docs = ops.t(spark, sf, "documents")
      .select("source", "n_chars", "text").collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase.split(" ", -1).toSet
        (r.getString(0), r.getLong(1) >= 306L,
          toks.contains("join") && toks.contains("query"))
      }
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val n = rs.length.toLong
      val agree = rs.count(r => r._2 == r._3).toLong
      val a1 = rs.count(_._2).toLong
      val b1 = rs.count(_._3).toLong
      val marg = a1 * b1 + (n - a1) * (n - b1)
      val den = n * n - marg
      val kappa: Any =
        if (den == 0) null
        else ((n * agree - marg) * 1000 + 1001 * den) / den - 1001
      (src, n, agree * 10000 / n, marg * 10000 / (n * n), kappa)
    }.toSet
    val got = run("q_cohens_kappa").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    got.foreach { r =>
      if (r._5 != null) {
        val k = r._5.asInstanceOf[Long]
        assert(k >= -1000L && k <= 1000L)
      }
    }
  }

  test("q_f1_class margins and diagonal are consistent") {
    val rows = run("q_f1_class").collect()
    assert(rows.nonEmpty)
    // total predictions == total truths (both margins sum to |dataset|)
    val rowSum = rows.map(_.getLong(1)).sum
    val colSum = rows.map(_.getLong(2)).sum
    assert(rowSum == colSum && rowSum > 0)
    rows.foreach { r =>
      val (rowTot, colTot, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp <= rowTot && tp <= colTot)
      if (!r.isNullAt(6)) {
        val f1 = r.getLong(6)
        assert(f1 >= 0 && f1 <= 10000)
        // F1 is bounded by both precision and recall (harmonic mean)
        if (!r.isNullAt(4) && !r.isNullAt(5))
          assert(f1 <= math.max(r.getLong(4), r.getLong(5)))
      }
    }
  }

  test("q_mcc matches brute-force 2x2 arithmetic") {
    val rows = run("q_mcc").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val n = ops.t(spark, sf, "embeddings").count()
    assert(tp + fp + fn + tn == n)
    val d = (tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn)
    if (d == 0) assert(r.isNullAt(4))
    else {
      val mcc = math.round((tp * tn - fp * fn).toDouble * 1000 /
        math.sqrt(d))
      assert(r.getLong(4) == mcc)
      assert(mcc >= -1000 && mcc <= 1000)
    }
  }
}
