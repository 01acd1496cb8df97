package graft

import org.apache.spark.sql.functions._
import graft.api.Graft

/** Round-16 gate: (1) the append-shaped incremental-dedup state —
  * `dedupIncremental(changedOnly = true)` returns BATCH-sized frames
  * (label delta + batch band rows) whose merge/append reconstruction
  * equals the full-state return and the full recluster (r15 verdict
  * item 1); (2) the batch-id replay guard and the band-domain guard —
  * the two documented-but-unchecked preconditions now fail loudly
  * (verdict item 2 + r15 advice); (3) thresholdBp threaded through
  * [[Graft.minhashClusters]] / [[Graft.dedupIncremental]] via the same
  * routed ladder as dedupClusters (verdict item 5); (4) the SPJ ingest
  * gate breadcrumb + conf re-keying (r15 advice); (5) the tag-less
  * warehouse-dir mtime TTL (r15 advice). */
class Round16GateSpec extends SparkSpec {

  private def labelSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Boolean)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private def bandSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---- (1) append-shaped incremental state -------------------------------

  test("dedupIncremental changedOnly: batch-sized delta reconstructs " +
      "the full state") {
    val docs = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .select("doc_id", "text")
    val day0 = docs.filter(col("doc_id") % 10 < 6)
    val day1 = docs.filter(col("doc_id") % 10 === 7)
    val labels0 = Graft.minhashClusters(day0, "doc_id", "text")
    val bands0 = Graft.minhashBandRows(day0, "doc_id", "text")
    val (lFull, bFull) = Graft.dedupIncremental(labels0, bands0, day1,
      "doc_id", "text")
    val (lDelta, bDelta) = Graft.dedupIncremental(labels0, bands0, day1,
      "doc_id", "text", changedOnly = true)
    // the bands side of the delta is EXACTLY the batch's band rows —
    // the O(batch) append into the standing bucketed table
    assert(bandSet(bDelta) ==
      bandSet(Graft.minhashBandRows(day1, "doc_id", "text")))
    // append-then-read == the full-state bands return
    assert(bandSet(bands0) ++ bandSet(bDelta) == bandSet(bFull))
    // the label delta MERGEd into the standing labels (replace rows by
    // id, insert new ids) == the full-state labels return == the full
    // recluster
    val deltaIds = lDelta.select("doc_id")
    val merged = labels0.join(deltaIds, Seq("doc_id"), "left_anti")
      .unionAll(lDelta)
    assert(labelSet(merged) == labelSet(lFull))
    assert(labelSet(lFull) == labelSet(
      Graft.minhashClusters(day0.unionAll(day1), "doc_id", "text")))
    // the delta is a STRICT delta: no row it carries for a standing id
    // repeats that id's standing label row (those are exactly the rows
    // the merge may skip writing)
    val standingRows = labelSet(labels0)
    assert(labelSet(lDelta).forall(r => !standingRows.contains(r)))
    // and it is genuinely batch-sized here: every standing row it
    // touches changed cluster, so |delta| ≤ |changed| + |batch|
    assert(lDelta.count() <= lFull.count())
    assert(lDelta.count() > 0)
  }

  test("changedOnly band rows APPEND into the standing bucketed table " +
      "and the re-read state is exact and still joins exchange-free") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // the PHYSICAL half of the append contract: the in-memory
    // merge/append reconstruction above is re-proven through a real
    // bucketed parquet table — write day0's bands bucketed+sorted by
    // the band key, APPEND the changedOnly return, and the re-read
    // table must (a) equal the full banding and (b) keep the
    // exchange-free corpus side for the next day's incremental join.
    // Name follows the graft_<word>_b<12hex>_<pid> reaper convention.
    val bt = s"graft_r16bands_b0123456789ab_${ProcessHandle.current().pid()}"
    graft.sources.FileFormats.resetTable(spark, bt)
    try {
      val docs = ops.t(spark, sf, "documents").filter(col("lang") === "en")
        .select("doc_id", "text")
      val day0 = docs.filter(col("doc_id") % 10 < 6)
      val day1 = docs.filter(col("doc_id") % 10 === 7)
      val day2 = docs.filter(col("doc_id") % 10 === 8)
      Graft.minhashBandRows(day0, "doc_id", "text", 4, 2)
        .write.mode("overwrite").format("parquet")
        .bucketBy(4, "band", "bkey").sortBy("band", "bkey")
        .saveAsTable(bt)
      val labels0 = Graft.minhashClusters(day0, "doc_id", "text", 4, 2)
      val (ld, bd) = Graft.dedupIncremental(labels0, spark.table(bt),
        day1, "doc_id", "text", bands = 4, rowsPerBand = 2,
        changedOnly = true)
      // evaluate BOTH returns before the append: their plans read the
      // standing table, which the append is about to grow
      val mergedLabels = labelSet(labels0
        .join(ld.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionAll(ld))
      val bdRows = bd.collect()
      assert(mergedLabels == labelSet(Graft.minhashClusters(
        day0.unionAll(day1), "doc_id", "text", 4, 2)))
      // the O(batch) daily write: append ONLY the batch's band rows
      spark.createDataFrame(
          java.util.Arrays.asList(bdRows: _*), bd.schema)
        .write.mode("append").format("parquet")
        .bucketBy(4, "band", "bkey").sortBy("band", "bkey")
        .saveAsTable(bt)
      assert(bandSet(spark.table(bt)) == bandSet(Graft.minhashBandRows(
        day0.unionAll(day1), "doc_id", "text", 4, 2)))
      // next day's incremental join over the re-read appended table
      // still plans exchange-free on the corpus side
      val df = Graft.minhashIncrementalBanded(
        spark.table(bt).hint("merge"),
        Graft.minhashBandRows(day2, "doc_id", "text", 4, 2))
      val smj = flattenPlan(df.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "banded incremental join lost its SMJ shape")
      val corpusSide = smj.head.children.map(flattenPlan).find(_.exists {
        case f: FileSourceScanExec => f.bucketedScan
        case _ => false
      })
      assert(corpusSide.isDefined, "no bucketed scan under the join")
      assert(corpusSide.get.collect {
        case e: ShuffleExchangeExec => e
      }.isEmpty, "corpus side paid an exchange after the append")
      assert(df.count() > 0)
    } finally graft.sources.FileFormats.resetTable(spark, bt)
  }

  // ---- (2) the replay + band-domain guards --------------------------------

  test("dedupIncremental: replayed batch id fails loudly (and the " +
      "guard is conf-gated)") {
    val s = spark; import s.implicits._
    // note the guard probes the standing BANDS, not the labels: doc 3
    // is a singleton (no near-dup, so no labels row) yet replaying it
    // must still trip
    val standing = Seq((1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val labels0 = Graft.minhashClusters(standing, "doc_id", "text")
    val bands0 = Graft.minhashBandRows(standing, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Graft.dedupIncremental(labels0, bands0,
        Seq((3L, "zeta eta theta"), (9L, "alpha beta"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
    }
    assert(e.getMessage.contains("already in the standing bands"))
    // conf ≤ 0 disables the guard (the documented big-batch escape
    // hatch) — the call must go through again
    s.conf.set("spark.graft.dedupIncValidateMaxBatchRows", "0")
    try {
      val (l, _) = Graft.dedupIncremental(labels0, bands0,
        Seq((3L, "zeta eta theta"), (9L, "alpha beta"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      assert(l.count() > 0)
    } finally s.conf.unset("spark.graft.dedupIncValidateMaxBatchRows")
  }

  test("dedupIncremental: mismatched bands count fails loudly (band " +
      "domain)") {
    val s = spark; import s.implicits._
    val standing = Seq((1L, "alpha beta"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
    val labels0 = Graft.minhashClusters(standing, "doc_id", "text",
      bands = 4, rowsPerBand = 2)
    val bands0 = Graft.minhashBandRows(standing, "doc_id", "text",
      bands = 4, rowsPerBand = 2)
    // same rowsPerBand (the bkey arity check passes) but a different
    // bands count: pre-r16 this silently lost every candidate in bands
    // 4..7; now the standing band DOMAIN pins it
    val e = intercept[IllegalArgumentException] {
      Graft.dedupIncremental(labels0, bands0,
        Seq((9L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text",
        bands = 8, rowsPerBand = 2)
    }
    assert(e.getMessage.contains("band domain"))
    // and the matching count still goes through and merges 9 into the
    // standing cluster
    val (l, _) = Graft.dedupIncremental(labels0, bands0,
      Seq((9L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text",
      bands = 4, rowsPerBand = 2)
    assert(l.count() == 3)
  }

  // ---- (3) thresholdBp threaded through the incremental tier -------------

  test("minhashClusters honors thresholdBp via the routed ladder") {
    val docs = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .select("doc_id", "text")
    // 8000bp routes to the (4,4) rung (Round15GateSpec pins the map) —
    // the threshold spelling must equal the explicit one
    assert(labelSet(Graft.minhashClusters(docs, "doc_id", "text",
        thresholdBp = 8000)) ==
      labelSet(Graft.minhashClusters(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 4)))
    // a disagreeing explicit banding alongside the threshold fails
    val e = intercept[IllegalArgumentException] {
      Graft.minhashClusters(docs, "doc_id", "text",
        bands = 2, rowsPerBand = 8, thresholdBp = 8000)
    }
    assert(e.getMessage.contains("incompatible banding"))
  }

  test("dedupIncremental honors thresholdBp and pins it against the " +
      "standing state's banding") {
    val docs = ops.t(spark, sf, "documents").filter(col("lang") === "en")
      .select("doc_id", "text")
    val day0 = docs.filter(col("doc_id") % 10 < 6)
    val day1 = docs.filter(col("doc_id") % 10 === 7)
    // standing state banded at the 8000bp rung (4,4) — BOTH halves
    // speak threshold (minhashBandRows accepts it too, round-16
    // review: the ingest side must not need a hand-translated rung)
    val labels0 = Graft.minhashClusters(day0, "doc_id", "text",
      thresholdBp = 8000)
    val bands0 = Graft.minhashBandRows(day0, "doc_id", "text",
      thresholdBp = 8000)
    assert(bandSet(bands0) == bandSet(Graft.minhashBandRows(
      day0, "doc_id", "text", bands = 4, rowsPerBand = 4)))
    val (lT, bT) = Graft.dedupIncremental(labels0, bands0, day1,
      "doc_id", "text", thresholdBp = 8000)
    val (lE, bE) = Graft.dedupIncremental(labels0, bands0, day1,
      "doc_id", "text", bands = 4, rowsPerBand = 4)
    assert(labelSet(lT) == labelSet(lE))
    assert(bandSet(bT) == bandSet(bE))
    // feeding a (8,2)-banded standing state at thresholdBp=8000 (rung
    // (4,4)) trips the arity pin — a standing state banded at one
    // threshold cannot be incrementally fed at another
    val bands82 = Graft.minhashBandRows(day0, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Graft.dedupIncremental(labels0, bands82, day1, "doc_id", "text",
        thresholdBp = 8000)
    }
    assert(e.getMessage.contains("rowsPerBand"))
  }

  // ---- (4) the SPJ vehicle is storage-backed ------------------------------

  test("q_join_spj: the DSv2 vehicle streams parquet files — the " +
      "registry holds only listings, never rows") {
    import graft.sources.{FileFormats, KeyGroupedMem}
    val got = SparkEntry.queries("q_join_spj")(spark, sf).collect()
      .map(_.toString).toSet
    assert(got.nonEmpty)
    // the registration the query just made: every key group of both
    // tables is a list of parquet FILE PATHS under the materialized
    // Hive layout — the driver-side footprint of the table is its
    // file listing, not its rows (round-16: the spjMaxRows sample
    // gate is gone because nothing is ever collected)
    val tag = FileFormats.dirTag(sf)
    for (t <- Seq(s"orders_spj_$tag", s"customer_spj_$tag")) {
      val spec = KeyGroupedMem.get(t)
      assert(spec.isDefined, s"$t not registered")
      assert(spec.get.parts.length == 8)
      val files = spec.get.parts.flatMap(_._2)
      assert(files.nonEmpty)
      assert(files.forall(f => f.endsWith(".parquet") &&
        new java.io.File(f).isFile))
      // each file belongs to the kmod=<k> directory of its key group
      spec.get.parts.foreach { case (k, fs) =>
        assert(fs.forall(_.contains(s"kmod=$k")))
      }
    }
    // and the streamed result equals the plain custkey join computed
    // by the engine directly on the source tables (the oracle's shape)
    val o = graft.Tables.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val c = graft.Tables.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val twin = graft.ops.orderedAll(o.join(c,
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        graft.ops.dsum(col("o_totalprice")).as("total")))
      .collect().map(_.toString).toSet
    assert(got == twin)
  }

  // ---- (5) tag-less warehouse dirs: mtime TTL -----------------------------

  test("sweepKeeps: tag-less graft_* dirs get a TTL, never instant " +
      "reaping; dead-pid tags still reap") {
    import graft.sources.FileFormats.sweepKeeps
    val now = System.currentTimeMillis()
    // a tag-less dir written just now: presumed live (the naming-drift
    // safety margin) — pre-r16 this was reaped on sight
    assert(sweepKeeps("graft_future_site_no_tag", now))
    assert(sweepKeeps("graft_tmp", now - 3600000L))
    // past the 6 h TTL it is débris and goes
    assert(!sweepKeeps("graft_tmp", now - 7L * 3600000L))
    // tagged names keep the pid-ownership test: our own pid keeps…
    val mine = ProcessHandle.current().pid()
    assert(sweepKeeps(s"graft_orders_b0123456789ab_$mine", now))
    // …a pid that cannot exist reaps even when freshly written
    assert(!sweepKeeps("graft_orders_b0123456789ab_99999999999", now))
  }
}
