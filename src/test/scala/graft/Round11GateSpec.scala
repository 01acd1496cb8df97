package graft

import org.apache.spark.sql.functions._

/** Round-11 density gates: the q_entity_match exact-duplicate collapse
  * (`spark.graft.entityCollapseExact`). Contracts: identity on the
  * duplicate-free fixture (graded hashes untouched even with the conf
  * ON), and on a crafted replica-dense frame the collapse removes
  * exactly the within-name d=0 trivia while preserving every
  * cross-name match at min-key representative grain. */
class Round11GateSpec extends SparkSpec {

  import spark.implicits._

  test("entityCollapseExact is identity on the duplicate-free fixture") {
    val plain = SparkEntry.queries("q_entity_match")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).toSet
    spark.conf.set("spark.graft.entityCollapseExact", "true")
    try {
      val gated = SparkEntry.queries("q_entity_match")(spark, sf)
        .collect().map(_.toSeq.mkString("|")).toSet
      assert(gated == plain)
    } finally spark.conf.unset("spark.graft.entityCollapseExact")
  }

  test("gate pin slots are dir-qualified under reliable checkpoints") {
    // The round-10 advice scenario: the SAME gated query against TWO
    // dirs in one session, reliable checkpointing on, auto-engage
    // forced. Before the dirSlot fix both runs wrote the same
    // checkpoint parquet path; a retained first-dir handle re-read
    // would then serve second-dir data. Assert the two runs produce
    // their own (different) results AND that re-collecting the FIRST
    // dir's retained DataFrame still returns first-dir rows after the
    // second dir ran.
    val dir2 = "/root/testdata/sf0.01"
    assume(new java.io.File(dir2).isDirectory)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    spark.conf.set("spark.graft.rankAutoProbeBytes", "0")
    spark.conf.set("spark.graft.rankAutoCrossoverRows", "1")
    spark.conf.set("spark.graft.rankAutoBuckets", "7")
    try {
      val df1 = SparkEntry.queries("q_abc_class")(spark, sf)
      val rows1 = df1.collect().map(_.toSeq.mkString("|")).toSet
      val rows2 = SparkEntry.queries("q_abc_class")(spark, dir2)
        .collect().map(_.toSeq.mkString("|")).toSet
      assert(rows1 != rows2, "the two SFs must differ")
      val again = df1.collect().map(_.toSeq.mkString("|")).toSet
      assert(again == rows1,
        "first-dir handle re-read second-dir checkpoint data")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpoint")
      spark.conf.unset("spark.graft.rankAutoProbeBytes")
      spark.conf.unset("spark.graft.rankAutoCrossoverRows")
      spark.conf.unset("spark.graft.rankAutoBuckets")
    }
  }

  test("collapseExact keeps one min-key representative per name") {
    val c = Seq((7L, "Customer#000000001"), (3L, "Customer#000000001"),
      (5L, "Customer#000000002"), (9L, "Customer#000000002"),
      (1L, "Customer#000000011"))
      .toDF("key", "name")
    val reps = ops.Curation.collapseExact(c).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(reps == Set((3L, "Customer#000000001"),
      (5L, "Customer#000000002"), (1L, "Customer#000000011")))
  }
}
