package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property layer (SURVEY §5.2.3): invariants over generated micro-frames.
  * Plain ScalaCheck driven through Test.check (no scalatestplus bridge in
  * the offline dependency set). */
class PropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  private val rows = Gen.listOfN(40,
    Gen.zip(Gen.choose(0, 5), Gen.choose(0, 10), Gen.choose(0.0, 100.0)))

  test("dedup is idempotent") {
    val s = spark; import s.implicits._
    holds(forAll(rows) { xs =>
      val once = xs.toDF("k", "g", "v").distinct()
      once.count() == once.distinct().count()
    })
  }

  test("semi-join bounded by left; inner bounded by |L|x|R|") {
    val s = spark; import s.implicits._
    holds(forAll(rows, rows) { (ls, rs) =>
      val l = ls.toDF("k", "g", "v")
      val r = rs.toDF("k", "g", "v")
      val semi = l.join(r.select("k").distinct(), Seq("k"), "left_semi").count()
      val inner = l.join(r, Seq("k")).count()
      semi <= l.count() && inner <= l.count() * r.count()
    })
  }

  test("row_number within [1, group size]") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    holds(forAll(rows) { xs =>
      val df = xs.toDF("k", "g", "v")
      val w = Window.partitionBy("g").orderBy(col("v"), col("k"))
      df.withColumn("rn", row_number().over(w))
        .groupBy("g").agg(max("rn").as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n")).count() == 0
    })
  }

  test("union-all multiplicity is additive") {
    val s = spark; import s.implicits._
    holds(forAll(rows, rows) { (ls, rs) =>
      val l = ls.toDF("k", "g", "v").select("k")
      val r = rs.toDF("k", "g", "v").select("k")
      l.union(r).count() == l.count() + r.count()
    })
  }
}
