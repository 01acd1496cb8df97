package graft

import org.apache.spark.sql.GraftSql
import graft.expressions.{FloatVecDot, FloatVecNorm2}
import graft.plans.{DotSelfToNorm, GraftExtensions}

/** The SparkSessionExtensions optimizer rule: dot(x,x) → ‖x‖². */
class ExtensionsSpec extends SparkSpec {

  test("DotSelfToNorm rewrites self-dot to norm2, leaves dot(a,b) alone") {
    val emb = Tables.table(spark, sf, "embeddings")
    val e = GraftSql.expression(emb("embedding"))
    val self = emb.select(GraftSql.column(FloatVecDot(e, e)).as("d"))
    val rewritten = DotSelfToNorm(self.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[FloatVecNorm2])))
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[FloatVecDot])))

    val other = emb.as("a").join(emb.as("b"), "vec_id")
    val ea = GraftSql.expression(other.col("a.embedding"))
    val eb = GraftSql.expression(other.col("b.embedding"))
    val cross = other.select(GraftSql.column(FloatVecDot(ea, eb)).as("d"))
    val kept = DotSelfToNorm(cross.queryExecution.analyzed)
    assert(kept.expressions.exists(_.exists(_.isInstanceOf[FloatVecDot])))
  }

  test("rewrite is value-preserving: norm2(x) == dot(x,x) on real rows") {
    val emb = Tables.table(spark, sf, "embeddings").limit(100)
    val e = GraftSql.expression(emb("embedding"))
    val rows = emb.select(
      GraftSql.column(FloatVecDot(e, e)).as("d"),
      GraftSql.column(FloatVecNorm2(e)).as("n")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("GraftExtensions registers the rule") {
    val rules = GraftSql.optimizerRules(spark, new GraftExtensions)
    assert(rules.contains(DotSelfToNorm))
  }
}
