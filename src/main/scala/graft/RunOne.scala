package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query, print wall time (cold + warm) and the
  * formatted physical plan. Usage: RunOne <name> [sfDir] [--explain]. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
