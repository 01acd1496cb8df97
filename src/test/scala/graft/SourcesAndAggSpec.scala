package graft

import java.nio.file.Files
import graft.functions.MinHashAggregator
import graft.sources.TextTables

/** Round-trip tests for the text/CSV/JSON source-sink layer and the
  * mergeable MinHash Aggregator (SURVEY §2.1 / §2.13 stretch). */
class SourcesAndAggSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("documents round-trips through tsv, csv, json") {
    val docs = Tables.table(spark, sf, "documents")
    val schema = Tables.schemas("documents")
    val base = Files.createTempDirectory("graft_src").toString
    TextTables.writeTsv(docs, s"$base/tsv")
    TextTables.writeCsv(docs, s"$base/csv")
    TextTables.writeJson(docs, s"$base/json")
    val expected = canon(docs)
    assert(canon(TextTables.readTsv(spark, s"$base/tsv", schema)) == expected)
    assert(canon(TextTables.readCsv(spark, s"$base/csv", schema)) == expected)
    assert(canon(TextTables.readJson(spark, s"$base/json", schema)) == expected)
  }

  test("minhash aggregator: partition-split signature equals single-pass") {
    val s = spark; import s.implicits._
    val toks = Tables.table(spark, sf, "documents")
      .limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq)
    val agg = new MinHashAggregator(16)
    toks.foreach { case (_, ts) =>
      val single = ts.foldLeft(agg.zero.clone())(agg.reduce)
      val (l, r) = ts.splitAt(ts.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero.clone())(agg.reduce),
        r.foldLeft(agg.zero.clone())(agg.reduce))
      assert(single.toSeq == merged.toSeq)
      // order/multiplicity invariance (it sketches the token SET)
      val shuffled = scala.util.Random.shuffle(ts ++ ts.take(3))
        .foldLeft(agg.zero.clone())(agg.reduce)
      assert(single.toSeq == shuffled.toSeq)
    }
  }

  test("minhash aggregator runs distributed via groupByKey and estimates Jaccard") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val tok = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), explode(ops.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .as[(Long, String)]
    val sigs = tok.groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAggregator(64).toColumn.name("sig"))
      .collect().toMap
    val sets = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 40).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    var total = 0; var close = 0
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val exact = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      val est = MinHashAggregator.estimate(sigs(a), sigs(b))
      total += 1
      if (math.abs(est - exact) <= 0.25) close += 1
    }
    // 64 lanes → σ ≈ 0.06; virtually every estimate within 0.25
    assert(close.toDouble / total >= 0.95, s"$close/$total within 0.25")
  }
}
