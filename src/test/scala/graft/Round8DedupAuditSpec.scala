package graft

/** Round-8 §2.69 operator checks: threshold sweep, MinHash accuracy,
  * and component profile against in-JVM brute force. */
class Round8DedupAuditSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Exact token sets of the en docs. */
  private def docSets: Map[Long, Set[String]] =
    ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty).toSet)
      .toMap

  /** All pairs with exact J >= 0.5 (the candPairs contract). */
  private def pairs: Seq[(Long, Long, Long)] = {
    val ds = docSets.toSeq.sortBy(_._1)
    for {
      i <- ds.indices; j <- i + 1 until ds.length
      (a, sa) = ds(i); (b, sb) = ds(j)
      common = (sa & sb).size.toLong
      if common * 3 >= sa.size + sb.size
    } yield (a, b, common * 10000 / (sa.size + sb.size - common))
  }

  test("q_dedup_sweep matches the brute-force threshold counts") {
    val ps = pairs
    val expected = Seq(5000L, 7000L, 8000L, 9000L).flatMap { cut =>
      val hit = ps.filter(_._3 >= cut)
      if (hit.isEmpty) None
      else Some((cut, hit.size.toLong,
        hit.map(_._1).distinct.size.toLong))
    }.toSet
    val got = run("q_dedup_sweep").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && expected.nonEmpty)
    // counts are monotone non-increasing in the cut
    val byCut = got.toSeq.sortBy(_._1).map(_._2)
    assert(byCut == byCut.sorted.reverse)
  }

  test("q_minhash_accuracy error bands are consistent") {
    val rows = run("q_minhash_accuracy").collect()
    assert(rows.nonEmpty)
    val nPairs = rows.map(_.getLong(1)).sum
    assert(nPairs == pairs.size.toLong)
    rows.foreach { r =>
      val (band, mean, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(band >= 5 && band <= 10)
      assert(mean <= mx && mx <= 10000)
    }
  }

  test("q_component_profile partitions the clustered docs") {
    val profile = run("q_component_profile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(profile.nonEmpty)
    val clustered = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .count()
    assert(profile.map(_._3).sum == clustered)
    profile.foreach { case (k, n, docs) => assert(k * n == docs) }
    // components have at least 2 members only if built from pairs;
    // singletons appear when a doc pairs then collapses — sizes >= 1
    assert(profile.forall(_._1 >= 1))
  }
}
