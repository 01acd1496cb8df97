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
