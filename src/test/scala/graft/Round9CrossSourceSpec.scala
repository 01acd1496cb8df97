package graft

/** §2.92 cross-source contamination: in-memory matrix recounts at
  * sf0.001 and internal-consistency checks against the sibling dedup
  * queries. */
class Round9CrossSourceSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_cross_source_dupes matches a hash-group recount") {
    val docs = ops.t(spark, sf, "documents")
      .selectExpr("source",
        "md5(concat_ws(' ', slice(split(lower(text), ' '), 1, 8)))")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byHash = docs.groupBy(_._2).view.mapValues(
      _.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
    val acc = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    for ((_, srcs) <- byHash; (sa, ca) <- srcs; (sb, cb) <- srcs
         if sa < sb) {
      val (h, p) = acc.getOrElse((sa, sb), (0L, 0L))
      acc((sa, sb)) = (h + 1, p + ca * cb)
    }
    val got = run("q_cross_source_dupes").collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == acc.toMap, s"diff ${(got.toSet diff acc.toSet).take(3)}")
    assert(got.nonEmpty, "no cross-source prefix dups — vacuous")
  }

  test("q_source_span_matrix matches a span-set recount") {
    val docs = ops.t(spark, sf, "documents")
      .selectExpr("source", "split(lower(text), ' ')")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.sliding(8).filter(_.size == 8)
        .map(_.mkString(" "))).toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
      n = (bySrc(srcs(i)) intersect bySrc(srcs(j))).size.toLong
      if n > 0
    } yield (srcs(i), srcs(j)) -> n).toMap
    val got = run("q_source_span_matrix").collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, s"diff ${(got.toSet diff want.toSet).take(3)}")
    assert(got.nonEmpty)
  }

  test("q_near_dup_sources is consistent with the q_dedup_near pair set") {
    val srcOf = ops.t(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = run("q_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) (sa, sb) else (sb, sa))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q_near_dup_sources").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.view.mapValues(_._1).toMap == want)
    for (((sa, sb), (_, cross)) <- got)
      assert(cross == (sa != sb))
    // both diagonal and off-diagonal cells must exist
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }
}
