package graft

/** Round-8 §2.52 operator checks: brute-force phrase and boolean
  * search over the collected corpus. */
class Round8SearchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(Long, String, Array[String])] =
    ops.t(spark, sf, "documents").select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1)))

  test("q_phrase_search finds every 'merge join' occurrence") {
    val expected = docs.flatMap { case (id, _, toks) =>
      toks.indices.dropRight(1).collect {
        case i if toks(i) == "merge" && toks(i + 1) == "join" =>
          (id, (i + 1).toLong)
      }
    }.toSet
    val got = run("q_phrase_search").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_boolean_search applies AND/AND/NOT posting algebra") {
    val expected = docs.collect {
      case (id, src, toks)
        if toks.contains("hash") && toks.contains("join") &&
          !toks.contains("stream") => (id, src)
    }.toSet
    val got = run("q_boolean_search").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected && expected.nonEmpty)
    // the NOT clause genuinely excludes: some hash∧join docs have stream
    val withStream = docs.count { case (_, _, t) =>
      t.contains("hash") && t.contains("join") && t.contains("stream") }
    assert(withStream > 0)
  }
}
