package graft

import org.apache.spark.sql.functions._
import graft.functions.HyperLogLog

/** Bounds and algebraic properties of the native HLL aggregate. */
class HyperLogLogSpec extends SparkSpec {

  test("estimate within 5% of exact distinct on events.user_id") {
    val e = Tables.table(spark, sf, "events")
    val exact = e.select("user_id").distinct().count().toDouble
    val est = e.agg(HyperLogLog.approxDistinct(col("user_id")))
      .head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05,
      s"est $est vs exact $exact")
  }

  test("estimate is partition-order independent (1 vs 32 partitions)") {
    val e = Tables.table(spark, sf, "events")
    val one = e.repartition(1)
      .agg(HyperLogLog.approxDistinct(col("user_id"))).head().getLong(0)
    val many = e.repartition(32, col("event_id"))
      .agg(HyperLogLog.approxDistinct(col("user_id"))).head().getLong(0)
    assert(one == many)
  }

  test("grouped estimates are sane and deterministic") {
    val rows = SparkEntry.queries("q_hll_custom")(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.table(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (tpe, est) = (r.getString(0), r.getLong(1))
      val ex = exact(tpe).toDouble
      assert(math.abs(est - ex) / ex < 0.1, s"$tpe: est $est vs exact $ex")
    }
    val again = SparkEntry.queries("q_hll_custom")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
