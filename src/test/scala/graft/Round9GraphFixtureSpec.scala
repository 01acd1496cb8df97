package graft

import org.apache.spark.sql.functions._

/** Round-9 item 3: the `spark.graft.graphEdgesPath` injection hook that
  * lets ScaleSmoke drive the §2.30/§2.36/§2.42 graph family over a
  * synthetic edge fixture (bypassing the near-dup pair pin). Correctness
  * is proven on a hand-computed 4-node graph — triangle {1,2,3} plus
  * pendant 4 on 3 — for one representative of each output shape. */
class Round9GraphFixtureSpec extends SparkSpec {

  private lazy val edgesPath: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_edges").resolve("e").toString
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("a_id", "b_id").coalesce(1).write.mode("overwrite").parquet(p)
    p
  }

  private def withEdges[T](f: => T): T = {
    spark.conf.set("spark.graft.graphEdgesPath", edgesPath)
    try f finally spark.conf.unset("spark.graft.graphEdgesPath")
  }

  private def rows(name: String): Set[Seq[Any]] = withEdges {
    SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSet
  }

  test("q_clustering_coeff over injected edges matches hand computation") {
    // deg: 1→2, 2→2, 3→3 (4 has deg 1, excluded); closed wedges: each
    // triangle vertex certifies one; coeff_bp = n_closed·20000/(d(d−1))
    assert(rows("q_clustering_coeff") == Set(
      Seq(1L, 2L, 1L, 10000L), Seq(2L, 2L, 1L, 10000L),
      Seq(3L, 3L, 1L, 3333L)))
  }

  test("q_label_prop over injected edges matches hand computation") {
    // min-label sweep: 1,2,3 → 1; 4 → 3. LPA mode step: everyone's
    // neighborhood mode is 1, so only 4 changes.
    assert(rows("q_label_prop") == Set(
      Seq(1L, 1L, 1L, false), Seq(2L, 1L, 1L, false),
      Seq(3L, 1L, 1L, false), Seq(4L, 3L, 1L, true)))
  }

  test("q_graph_2hop over injected edges matches hand computation") {
    // distance-2 non-adjacent pairs: (1,4) and (2,4) via center 3
    assert(rows("q_graph_2hop") == Set(
      Seq(1L, 2L, 1L), Seq(2L, 2L, 1L), Seq(3L, 3L, 0L),
      Seq(4L, 1L, 2L)))
  }

  test("q_graph_modularity over injected edges matches hand computation") {
    // min-label sweep lbl(u)=least(u, min nbr): 1,2,3 → 1; 4 → 3 → two
    // communities. m=4. lbl 1 = {1,2,3}: e_in=3, d_tot=7, contrib =
    // (4·4·3 − 49)·10⁶ div 64 = −10⁶/64 = −15625 (exact, no rounding
    // ambiguity). lbl 3 = {4}: e_in=0, d_tot=1 → also −15625.
    assert(rows("q_graph_modularity") == Set(
      Seq(1L, 3L, 3L, 7L, -15625L), Seq(3L, 1L, 0L, 1L, -15625L)))
  }

  test("q_bridge_edges over injected edges matches hand computation") {
    // triangle-supported: (1,2),(1,3),(2,3); bridge: (3,4) → 2500 bp
    assert(rows("q_bridge_edges") == Set(Seq(4L, 3L, 1L, 2500L)))
  }

  test("q_degree_hist over injected edges matches hand computation") {
    // band 0 (deg 1): node 4; band 1 (deg 2–3): nodes 1,2,3 (Σdeg 7)
    assert(rows("q_degree_hist") == Set(
      Seq(0L, 1L, 1L, 2500L, 1250L), Seq(1L, 3L, 7L, 7500L, 8750L)))
  }

  test("q_closure_by_degree over injected edges matches hand computation") {
    // all 5 wedges have band-1 centers; 3 close (one per triangle vertex)
    assert(rows("q_closure_by_degree") == Set(Seq(1L, 5L, 3L, 6000L)))
  }

  test("graphgen fixture is deterministic and community-sparse") {
    // tiny graphgen twin: same hash-gate arithmetic as ScaleSmoke's
    // generator, evaluated here over 5 communities — verifies the gate
    // keeps ~60% of within pairs and that edges never cross non-adjacent
    // communities (the community-sparse property the smoke relies on)
    val k = 12
    val within = spark.range(5).selectExpr("id AS c")
      .selectExpr("c",
        s"explode(flatten(transform(sequence(0, ${k - 2}), i -> " +
          s"transform(sequence(i + 1, ${k - 1}), j -> " +
          "struct(i AS i, j AS j))))) AS p")
      .selectExpr(s"c * $k + p.i AS a_id", s"c * $k + p.j AS b_id")
      .filter("pmod(xxhash64(a_id, b_id), 10) < 6")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(within.length > 5 * 66 * 4 / 10 && within.length < 5 * 66 * 8 / 10,
      s"gate kept ${within.length} of ${5 * 66}")
    assert(within.forall { case (a, b) => a / k == b / k },
      "a within-community pair crossed a community boundary")
  }
}
