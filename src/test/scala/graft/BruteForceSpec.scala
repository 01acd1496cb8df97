package graft

import org.apache.spark.sql.Row

/** Golden layer (SURVEY §5.2.2): operators whose oracle is omitted or
  * non-trivial get an independent brute-force check on sf0.001, computed
  * driver-side from collected rows. */
class BruteForceSpec extends SparkSpec {

  test("q_knn_cosine matches brute-force cosine top-5") {
    val emb = Tables.table(spark, sf, "embeddings")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val expected = (for {
      (pid, pv) <- emb.filter(_._1 < 10)
      ranked = emb.filter(_._1 != pid)
        .map { case (nid, nv) => (nid, cos(pv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(5)
      ((nid, c), i) <- ranked.zipWithIndex
    } yield (pid, nid, (i + 1).toLong, math.rint(c * 10000) / 10000)).toSet
    val got = SparkEntry.queries("q_knn_cosine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // compare sets modulo the round-half rule (rint vs HALF_UP differs at
    // exact .00005 boundaries, which don't occur — assert with tolerance)
    assert(got.size == expected.size)
    val g = got.toSeq.sortBy(t => (t._1, t._3))
    val e = expected.toSeq.sortBy(t => (t._1, t._3))
    g.zip(e).foreach { case ((gp, gn, gr, gs), (ep, en, er, es)) =>
      assert(gp == ep && gn == en && gr == er && math.abs(gs - es) < 1e-9)
    }
  }

  test("q_dedup_near matches O(n^2) Jaccard") {
    val docs = Tables.table(spark, sf, "documents")
      .filter("lang = 'en'").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSet)
      .sortBy(_._1)
    val expected = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (a, ta) = docs(i); (b, tb) = docs(j)
      common = ta.intersect(tb).size
      if 9 * common >= 4 * (ta.size + tb.size)
    } yield (a, b)).toSet
    val got = SparkEntry.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("invertedPairs (>64-vocab strategy) matches O(n^2) over shingles") {
    // Drive the inverted-index branch directly on the bigram-shingle
    // space (~900 distinct shingles — far past the 64-bit mask limit),
    // where the graded corpus can't reach it (token vocab is 31).
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sf, "documents").filter("lang = 'en'")
    val dt = docs.select(col("doc_id"),
        explode(expr("""filter(
          |  transform(split(lower(text), ' '), (x, i) ->
          |    CASE WHEN i < size(split(lower(text), ' ')) - 1
          |         THEN concat(x, ' ', split(lower(text), ' ')[i + 1]) END),
          |  b -> b IS NOT NULL)""".stripMargin)).as("token"))
      .distinct()
    val got = ops.Text.invertedPairs(dt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val local = docs.collect().map { r =>
      val toks = r.getString(1).toLowerCase.split(" ")
      r.getLong(0) -> toks.zip(toks.tail).map { case (a, b) => s"$a $b" }.toSet
    }.sortBy(_._1)
    val expected = (for {
      i <- local.indices; j <- (i + 1) until local.length
      (a, ta) = local(i); (b, tb) = local(j)
      common = ta.intersect(tb).size
      if 9 * common >= 4 * (ta.size + tb.size)
    } yield (a, b, common.toLong, ta.size.toLong, tb.size.toLong)).toSet
    assert(got == expected,
      s"missing: ${expected.diff(got).take(3)} extra: ${got.diff(expected).take(3)}")
  }

  test("q_approx_distinct within 5% of exact") {
    val exact = Tables.table(spark, sf, "events")
      .groupBy("event_type").agg(
        org.apache.spark.sql.functions.countDistinct("user_id").as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
      .foreach { r =>
        val (tpe, approx) = (r.getString(0), r.getLong(1))
        val ex = exact(tpe).toDouble
        assert(math.abs(approx - ex) / ex <= 0.05,
          s"$tpe: approx $approx vs exact $ex")
      }
  }

  test("q_events_sliding matches hand multi-emit") {
    import org.apache.spark.sql.functions._
    val evs = Tables.table(spark, sf, "events")
      .select(unix_micros(col("ts")).as("us")).collect().map(_.getLong(0))
    val slide = 1800L * 1000000L
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    evs.foreach { us =>
      val w1 = us - (us % slide)
      Seq(w1, w1 - slide).foreach { w =>
        counts(w / 1000000L) = counts.getOrElse(w / 1000000L, 0L) + 1
      }
    }
    val got = SparkEntry.queries("q_events_sliding")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == counts.toMap)
  }

  test("q_events_session: session count is monotone non-increasing in gap") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def sessions(gapMin: Long): Long = {
      val e = Tables.table(spark, sf, "events")
        .withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      e.withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("ns", when(col("prev").isNull ||
          col("us") - col("prev") > gapMin * 60L * 1000000L, 1).otherwise(0))
        .agg(sum(col("ns"))).collect()(0).getLong(0)
    }
    val s15 = sessions(15); val s30 = sessions(30); val s60 = sessions(60)
    assert(s15 >= s30 && s30 >= s60)
  }
}
