package graft

/** Round-8 §2.66 operator checks: lexicon filter, vocabulary overlap,
  * and character trigrams against in-JVM brute force. */
class Round8LexiconSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private val denylist = Seq("slow", "dup", "deprecated")

  test("q_lexicon_filter matches brute force, zero-hit terms included") {
    val docs = ops.t(spark, sf, "documents").select("source", "text")
      .collect().map(r => (r.getString(0),
        r.getString(1).toLowerCase.split(" ", -1).toSeq))
    val bySource = docs.groupBy(_._1).map { case (src, ds) =>
      val removed = ds.count(d => denylist.exists(d._2.contains)).toLong
      src -> (ds.length.toLong, removed)
    }
    val expected = (for {
      (src, (nDocs, removed)) <- bySource.toSeq
      term <- denylist
    } yield {
      val ds = docs.filter(_._1 == src)
      (src, term, ds.count(_._2.contains(term)).toLong,
        ds.map(_._2.count(_ == term).toLong).sum, nDocs, removed,
        removed * 10000 / nDocs)
    }).toSet
    val got = run("q_lexicon_filter").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))).toSet
    assert(got == expected && expected.nonEmpty)
    // the never-occurring term still reports its zero row everywhere
    assert(got.count(_._2 == "deprecated") == bySource.size)
    assert(got.filter(_._2 == "deprecated").forall(_._3 == 0))
  }

  test("q_vocab_overlap matches brute-force set Jaccard") {
    val vocab = ops.t(spark, sf, "documents").select("source", "text")
      .collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).map(tk => (r.getString(0), tk)))
      .distinct.groupBy(_._1)
      .map { case (s2, o) => s2 -> o.map(_._2).toSet }
    val srcs = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
      (a, b) = (srcs(i), srcs(j))
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
    } yield (a, b, vocab(a).size.toLong, vocab(b).size.toLong, inter,
      inter * 10000 / (vocab(a).size + vocab(b).size - inter))).toSet
    val got = run("q_vocab_overlap").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // Jaccard bounds
    assert(got.forall(r => r._6 >= 0 && r._6 <= 10000))
  }

  test("q_char_trigrams matches brute-force top-10 per lang") {
    val docs = ops.t(spark, sf, "documents").select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = docs.filter(_._2.length >= 3)
      .flatMap { case (lang, txt) =>
        (0 to txt.length - 3).map(i => (lang, txt.substring(i, i + 3)))
      }.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val expected = counts.toSeq.groupBy(_._1._1).flatMap {
      case (lang, gs) =>
        gs.sortBy { case ((_, g), c) => (-c, g) }.take(10).zipWithIndex
          .map { case (((_, g), c), i) => (lang, i + 1L, g, c) }
    }.toSet
    val got = run("q_char_trigrams").collect().map(r => (r.getString(0),
      r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
