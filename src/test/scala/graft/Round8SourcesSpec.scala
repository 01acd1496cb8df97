package graft

/** Round-8 §2.70 source-format checks: XML round-trip fidelity, text
  * line parsing, and mergeSchema evolution semantics. */
class Round8SourcesSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_source_xml equals the same fold on the original parquet") {
    val direct = ops.t(spark, sf, "nation")
      .join(ops.t(spark, sf, "region"),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .groupBy("r_name")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("n_name").as("min_nation"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val got = run("q_source_xml").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == direct && direct.nonEmpty)
  }

  test("q_source_text parses every line back") {
    val got = run("q_source_text").collect()
    val docs = ops.t(spark, sf, "documents")
    assert(got.map(_.getLong(1)).sum == docs.count())
    assert(got.map(_.getLong(2)).sum ==
      docs.selectExpr("CAST(sum(n_chars) AS BIGINT)").head.getLong(0))
  }

  test("q_schema_evolution surfaces the missing generation as NULL") {
    val rows = run("q_schema_evolution").collect()
    assert(rows.exists(_.isNullAt(0)), "1996 generation should be NULL")
    assert(rows.count(!_.isNullAt(0)) >= 2,
      "1997 generation carries real priorities")
    // the NULL group is exactly the 1996 orders
    val n96 = ops.t(spark, sf, "orders")
      .filter("o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'").count()
    assert(rows.filter(_.isNullAt(0)).map(_.getLong(1)).sum == n96)
  }
}
