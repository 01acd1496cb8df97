package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Round-6 checks: the corpus-size strategy switches added to the exact
  * dedup family (VERDICT r5 findings 1/2/4), the shuffle-partitioned
  * PageRank (finding 3), and the conf-gated skew guards (finding "what's
  * missing" #3). Each switch is driven on the fixture by forcing the
  * at-scale branch via conf and asserting result-set equality with the
  * default branch — the same contract the driver's oracle pins. */
class Round6Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("q_dedup_ngram: inverted-index branch ≡ bitmap-NLJ branch") {
    val small = rowSet(run("q_dedup_ngram"))
    val large = withConf("spark.graft.pairNljMaxDocs" -> "1") {
      rowSet(run("q_dedup_ngram"))
    }
    assert(small.nonEmpty, "no ngram near-dup pairs at test SF — vacuous")
    assert(large == small,
      s"branch mismatch: only-small=${(small -- large).take(3)} " +
        s"only-large=${(large -- small).take(3)}")
  }

  test("q_dedup_near: both at-scale branches ≡ 64-bit-mask branch") {
    val small = rowSet(run("q_dedup_near"))
    // tiny vocab + forced-large corpus → distinct-mask grouping
    val grouped = withConf("spark.graft.pairNljMaxDocs" -> "1") {
      rowSet(run("q_dedup_near"))
    }
    // mask grouping disabled → inverted-index posting join
    val inverted = withConf("spark.graft.pairNljMaxDocs" -> "1",
      "spark.graft.maskGroupMaxDict" -> "0") {
      rowSet(run("q_dedup_near"))
    }
    // adversarial-density guard: too many DISTINCT masks → same fallback
    val guarded = withConf("spark.graft.pairNljMaxDocs" -> "1",
      "spark.graft.maskGroupMaxMasks" -> "1") {
      rowSet(run("q_dedup_near"))
    }
    assert(small.nonEmpty)
    assert(grouped == small, "mask-group branch diverged")
    assert(inverted == small, "inverted-index branch diverged")
    assert(guarded == small, "mask-count guard fallback diverged")
  }

  test("maskGroupPairs ≡ brute force on a duplicate-heavy tiny-vocab corpus") {
    // 240 docs over an 8-token vocabulary but only 97 distinct token sets —
    // the regime the branch exists for: pair over M=97 distinct masks
    // (O(M²)), not N=240 docs, then expand the groups.
    val vocab = Array("ta", "tb", "tc", "td", "te", "tf", "tg", "th")
    val rows = (0L until 240L).map { d =>
      val m = 1 + (d % 97)
      d -> vocab.indices.filter(i => ((m >> i) & 1) == 1)
        .map(vocab).mkString(" ")
    }
    val dir = writeDocs(rows)
    val sets = rows.map { case (d, tx) => d -> tx.split(" ").toSet }.toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      c = (sets(a) & sets(b)).size
      if c * 9 >= (sets(a).size + sets(b).size) * 4
    } yield (a, b)).toSet
    assert(expected.exists { case (a, b) => sets(a) == sets(b) },
      "no identical-set pairs — within-group path untested")
    assert(expected.exists { case (a, b) => sets(a) != sets(b) },
      "no cross-set pairs — cross-group path untested")
    val grouped = withConf("spark.graft.pairNljMaxDocs" -> "1") {
      ops.Text.qDedupNear(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(grouped == expected,
      s"missed=${(expected -- grouped).take(5)} extra=${(grouped -- expected).take(5)}")
    // the NLJ branch sees the same corpus the same way
    val nlj = ops.Text.qDedupNear(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nlj == expected)
  }

  test("q_dedup_clusters + q_graph_degree inherit the at-scale branch") {
    val (cl, gd) = (rowSet(run("q_dedup_clusters")), rowSet(run("q_graph_degree")))
    withConf("spark.graft.pairNljMaxDocs" -> "1") {
      assert(rowSet(run("q_dedup_clusters")) == cl)
      assert(rowSet(run("q_graph_degree")) == gd)
    }
  }

  test("q_dedup_embedding: LSH-table branch ≡ exact branch on fixture") {
    val exact = rowSet(run("q_dedup_embedding"))
    val lsh = withConf("spark.graft.embNljMaxVecs" -> "1") {
      rowSet(run("q_dedup_embedding"))
    }
    assert(exact.nonEmpty, "no embedding near-dups at test SF — vacuous")
    assert(lsh == exact,
      s"LSH branch diverged: missed=${(exact -- lsh).take(5)} " +
        s"extra=${(lsh -- exact).take(5)}")
  }

  test("q_pagerank: no-broadcast mode hash-matches, plans shuffle joins") {
    val base = run("q_pagerank").collect().map(_.toSeq).toSeq
    withConf("spark.graft.pagerankNoBroadcast" -> "true") {
      val df = run("q_pagerank")
      assert(df.collect().map(_.toSeq).toSeq == base)
      val plan = df.queryExecution.sparkPlan
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        "broadcast join on the rank path in at-scale mode")
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    }
  }

  // ---- skew guards on a generated boilerplate-heavy corpus ------------

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r6").toString
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("contamination df-cap drops boilerplate shingles") {
    // 11 tokens/doc: 5 unique + a 6-token boilerplate tail. The only
    // CROSS-doc 5-grams are the two all-boilerplate ones (df = 40).
    val dir = writeDocs((0L until 40L).map(d =>
      d -> s"u${d}a u${d}b u${d}c u${d}d u${d}e all rights reserved click here now"))
    val uncapped = ops.Text.qContamination(spark, dir).collect()
    assert(uncapped.length == 20, "every even doc should be flagged")
    assert(uncapped.forall(r => r.getLong(1) == 2 && r.getLong(2) == 20 &&
      r.getLong(3) == 40), "boilerplate overlap shape off")
    val capped = withConf("spark.graft.contamMaxShingleDf" -> "5") {
      ops.Text.qContamination(spark, dir).collect()
    }
    // With df>5 shingles removed, no shared 5-grams remain: the hot-key
    // join input is bounded by the cap instead of corpus size.
    assert(capped.isEmpty,
      s"df-cap left ${capped.length} contaminated docs")
  }

  test("pmi df-band cap excludes ubiquitous tokens from pairing") {
    // 'hot' in all 40 docs (df 40); 'warm'/'cool' in 10 (df 10); the
    // rest unique. Support ≥5 pairs: (cool,warm) and the two hot pairs.
    val dir = writeDocs((0L until 40L).map(d =>
      d -> (s"hot ${if (d < 10) "warm cool " else ""}u${d}a u${d}b")))
    def pairs(df: Array[org.apache.spark.sql.Row]): Set[(String, String)] =
      df.map(r => (r.getString(0), r.getString(1))).toSet
    val uncapped = pairs(ops.Text.qCooccurPmi(spark, dir).collect())
    assert(uncapped == Set(("cool", "warm"), ("hot", "warm"), ("hot", "cool"))
      .map { case (a, b) => if (a < b) (a, b) else (b, a) })
    val capped = withConf("spark.graft.pmiMaxDf" -> "15") {
      ops.Text.qCooccurPmi(spark, dir).collect()
    }
    assert(pairs(capped) == Set(("cool", "warm")),
      "df-band cap should keep only the mid-band pair")
    // df columns stay full-corpus in capped mode
    assert(capped.forall(r => r.getLong(3) == 10 && r.getLong(4) == 10))
  }
}
