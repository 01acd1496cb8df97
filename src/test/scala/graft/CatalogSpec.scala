package graft

/** The ad-hoc SQL surface: register tables, run plain Spark SQL. */
class CatalogSpec extends SparkSpec {

  test("registered views answer ad-hoc SQL joins") {
    Catalog.registerTables(spark, sf)
    val rows = spark.sql(
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(rows.length == 5 && rows.map(_.getLong(1)).sum == 1500)
  }

  test("views expose the ns-timestamp events table as usable timestamps") {
    Catalog.registerTables(spark, sf)
    val n = spark.sql(
      """SELECT count(*) FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND event_type = 'click'"""
        .stripMargin).collect()(0).getLong(0)
    assert(n > 0)
  }
}
