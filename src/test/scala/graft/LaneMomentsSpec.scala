package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.LaneMoments

/** r16 optimization pin: the LaneMoments aggregate must reproduce the
  * explode-based pair-moment table EXACTLY — including the null/short/
  * missing-lane corner cases the graded fixture never exercises — and
  * be partition-order independent (it replaces a 2016×-row explode in
  * q_dim_corr, whose oracle hash must not move). */
class LaneMomentsSpec extends SparkSpec {

  /** The old q_dim_corr spelling: in-row pair explode + groupBy(i, j). */
  private def explodeMoments(lanes: DataFrame, d: Int): DataFrame =
    lanes.select(explode(expr(
      s"""flatten(transform(sequence(1, ${d - 1}), i ->
         |  transform(sequence(i + 1, $d), j ->
         |    struct(i AS i, j AS j, xu[i - 1] AS x, xu[j - 1] AS y))))"""
        .stripMargin)).as("p"))
      .select(col("p.i").cast("long").as("i"),
        col("p.j").cast("long").as("j"), col("p.x").as("x"),
        col("p.y").as("y"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("qx"), sum(expr("y * y")).as("qy"),
        sum(expr("x * y")).as("sxy"))

  private def aggMoments(lanes: DataFrame, d: Int): DataFrame =
    lanes.agg(LaneMoments.moments(col("xu"), d).as("ms"))
      .select(explode(col("ms")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("p.n").as("n"),
        col("p.sx").as("sx"), col("p.sy").as("sy"),
        col("p.qx").as("qx"), col("p.qy").as("qy"),
        col("p.sxy").as("sxy"))

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("i", "j").collect().toSeq.map(_.toSeq)

  test("matches the explode spelling on the fixture embeddings") {
    val lanes = Tables.table(spark, sf, "embeddings")
      .withColumn("xu", expr("transform(embedding, v -> " +
        "CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))"))
    assert(sortedRows(aggMoments(lanes, 64)) ==
      sortedRows(explodeMoments(lanes, 64)))
  }

  test("matches on null arrays, short arrays and null elements") {
    import spark.implicits._
    // A SHORT array is declared to behave as if null-padded to d (under
    // ANSI the old explode's xu[i-1] would ERROR on it; the fixture
    // never ships one). The reference therefore runs on the padded
    // frame, the aggregate on the raw short one.
    val rows: Seq[Option[Seq[Option[Long]]]] = Seq(
      Some(Seq(Some(1L), Some(2L), Some(3L), Some(4L))),
      None, // whole array null: still counts toward n
      Some(Seq(Some(5L), None, Some(7L), None)), // null elements
      Some(Seq(Some(9L))), // short array: lanes 2..4 absent
      Some(Seq(None, None, None, None)), // all-null elements
      Some(Seq(Some(-3L), Some(11L), Some(0L), Some(2L))))
    val padded = rows.map(_.map(a => a ++ Seq.fill(4 - a.size)(None)))
    val lanes = rows.toDF("xu")
    val lanesPadded = padded.toDF("xu")
    assert(sortedRows(aggMoments(lanes, 4)) ==
      sortedRows(explodeMoments(lanesPadded, 4)))
  }

  test("a lane with no values yields NULL sums, exactly like sum()") {
    import spark.implicits._
    // lane 2 never present -> sx/qx NULL for i=2 rows, sxy NULL for any
    // pair touching lane 2
    val lanes = Seq(Seq[Option[Long]](Some(1L), None, Some(2L)),
      Seq[Option[Long]](Some(4L), None, Some(6L))).toDF("xu")
    val got = sortedRows(aggMoments(lanes, 3))
    val want = sortedRows(explodeMoments(lanes, 3))
    assert(got == want)
    val p12 = got.find(r => r.head == 1L && r(1) == 2L).get
    assert(p12(4) == null && p12(7) == null) // sy, sxy
  }

  test("partition-order independent (1 vs 7 partitions)") {
    val lanes = Tables.table(spark, sf, "embeddings")
      .withColumn("xu", expr("transform(embedding, v -> " +
        "CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))"))
    val one = sortedRows(aggMoments(lanes.repartition(1), 64))
    val many = sortedRows(aggMoments(lanes.repartition(7, col("vec_id")), 64))
    assert(one == many)
  }

  test("q_dim_corr output is unchanged by the aggregate rewrite") {
    // top-10 |corr| pairs, recomputed from the explode spelling's moment
    // table through the same scoring expression
    val got = SparkEntry.queries("q_dim_corr")(spark, sf).collect()
      .toSeq.map(_.toSeq)
    val lanes = Tables.table(spark, sf, "embeddings")
      .withColumn("xu", expr("transform(embedding, v -> " +
        "CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))"))
    val scored = explodeMoments(lanes, 64).withColumn("corr_milli", expr(
      "CASE WHEN n * qx - sx * sx = 0 OR n * qy - sy * sy = 0 THEN NULL " +
        "ELSE CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) * 1000 / " +
        "sqrt(CAST(n * qx - sx * sx AS DOUBLE) * " +
        "CAST(n * qy - sy * sy AS DOUBLE))) AS BIGINT) END"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(abs(col("corr_milli")).desc, col("i").asc, col("j").asc)
    val want = ops.orderedAll(scored.filter(col("corr_milli").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("i", "j", "n", "corr_milli")).collect().toSeq.map(_.toSeq)
    assert(got == want)
  }
}
