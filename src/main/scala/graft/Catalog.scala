package graft

import org.apache.spark.sql.SparkSession

/** User-facing catalog: registers every pinned table as a temp view so
  * arbitrary Spark SQL runs over the same inputs the operator library
  * uses — the migration path for reference users whose "queries" are
  * ad-hoc jobs rather than the named operators in SparkEntry.
  */
object Catalog {
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.schemas.keys.foreach { name =>
      Tables.table(spark, sfDir, name).createOrReplaceTempView(name)
    }
}
