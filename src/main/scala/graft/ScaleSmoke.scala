package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10× scale smoke (SURVEY §6 / round-6 verdict item 8): builds a
  * ~sf1-scale dataset by replicating the sf0.1 fixture with key offsets,
  * then times a battery of the heaviest queries against it — the first
  * empirical datapoint behind the "would this plan survive 10×?" claims.
  * Results are recorded in BASELINE.md; this main is NOT part of the
  * driver contract (Verify/Bench are) and runs only when invoked by hand.
  *
  * Replication design (what 10× MEANS here):
  *  - every table's keys are offset per replica (k·10⁸) so joins stay
  *    consistent inside a replica and never collide across replicas;
  *    region/nation (true dims) are shared.
  *  - documents get 8 replica-distinct salt tokens appended (k>0), so
  *    (a) cross-replica copies of a doc are NOT near-duplicates (the
  *    salt drops Jaccard below every graded threshold — otherwise the
  *    pair OUTPUT itself would grow quadratically, ×100, and the smoke
  *    would measure result-writing, not the operator), and (b) the
  *    vocabulary exceeds 64 tokens, which flips the dedup family onto
  *    its at-scale branches — exactly the paths the smoke exists to
  *    exercise.
  *  - probe sets (doc_id/vec_id < K filters) keep selecting only
  *    replica-0 rows: a fixed query workload over a 10× corpus, the
  *    realistic growth pattern.
  *
  * Usage:  ScaleSmoke gen  <srcSfDir> <dstDir> <replicas>
  *         ScaleSmoke run  <dir> <q1,q2,...>
  */
object ScaleSmoke {
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional conf overrides, e.g. the density-gate / branch switches:
    //   SPARK_GRAFT_CONF="spark.graft.dedupMaxPairsPerDoc=50"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    args(0) match {
      case "gen" => gen(spark, args(1), args(2), args(3).toInt)
      case "run" => run(spark, args(1), args(2).split(",").toIndexedSeq)
      case "graphgen" => graphGen(spark, args(1), args(2).toInt)
      case "top15" => top15(spark, args(1), args(2))
      case "apidedup" => apiDedup(spark, args(1))
      case "ccinc" => ccInc(spark, args(1))
      case "dedupinc" => dedupInc(spark, args(1))
      case "dedupinc100" => dedupInc(spark, args(1), sketchIngest = true)
    }
    spark.stop()
  }

  /** Standing 100× regression gate (round-9 item 7): run EXACTLY the 15
    * slowest keys of a driver bench capture against `dir` in one
    * invocation — `ScaleSmoke top15 <dir> <BENCH_rN.json>` — so each
    * round's hottest queries get a dated at-scale datapoint in
    * BASELINE.md instead of ad-hoc per-batch smokes. The bench JSON line
    * arrives embedded (escaped) in the driver's "tail" capture; unescape
    * and take the LAST queries map. */
  private def top15(s: SparkSession, dir: String, benchJson: String): Unit = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(benchJson)), "UTF-8").replace("\\\"", "\"")
    // The Bench contract is a FLAT "queries" map of "q_key":seconds pairs,
    // so the first '}' after the last "queries":{ closes it — but never
    // assume silently: every comma-separated entry must parse as exactly
    // one key:number pair, and a full bench map has hundreds. A count
    // mismatch (nesting, truncation, an escape this unescape missed)
    // fails loudly instead of yielding a quietly-wrong top-15 list.
    // Locate the LAST queries map with whitespace-tolerant matching
    // (round-11 advice fix: the old literal '"queries":{' broke on any
    // serializer that padded the colon).
    val tag = """"queries"\s*:\s*\{""".r
    val m = tag.findAllMatchIn(raw).toSeq.lastOption.getOrElse(
      sys.error(s"no queries map found in $benchJson"))
    val body = raw.substring(m.end)
    val end = body.indexOf('}')
    require(end >= 0, s"unterminated queries map in $benchJson")
    val inner = body.substring(0, end)
    val kv = """^"(q_[a-z0-9_]+)"\s*:\s*([0-9.eE+-]+)$""".r
    val pairs = inner.split(",").toSeq.map(_.trim).map {
      case kv(k, v) => k -> v.toDouble
      case other => sys.error(
        s"unparseable queries entry in $benchJson: '$other'")
    }
    // A short map is only acceptable when the caller SAYS it is
    // (SPARK_GRAFT_ALLOW_SMALL_TOP15=1, for deliberately small
    // captures): a truncated or mis-parsed bench JSON — the naive
    // brace scan stops at the first '}' — would otherwise silently
    // shrink the standing gate to however many entries survived, and
    // a gate that exercises almost nothing still reads as green
    // (round-12 advice). The earlier per-entry kv match already
    // rejects nesting/garbage; this rejects quiet truncation.
    if (pairs.size < 15) {
      require(sys.env.get("SPARK_GRAFT_ALLOW_SMALL_TOP15").contains("1"),
        s"only ${pairs.size} queries parsed from $benchJson — a full " +
          "bench map has hundreds; refusing the smoke (set " +
          "SPARK_GRAFT_ALLOW_SMALL_TOP15=1 for a deliberately small capture)")
      println(s"[top15] WARNING: only ${pairs.size} queries in " +
        s"$benchJson — running all of them instead of a top-15")
    }
    val keys = pairs.sortBy(-_._2).take(15).map(_._1)
    println(s"[top15] from $benchJson: ${keys.mkString(",")}")
    run(s, dir, keys)
  }

  /** Synthetic community-sparse edge fixture (round-9 item 3): `nComm`
    * communities of 12 nodes; within-community pairs kept by a
    * deterministic 60% xxhash64 gate (expected degree ≈ 6.6 — a solid
    * 3-core with peelable stragglers), plus a 50%-gated bridge edge
    * between consecutive community anchors (inter-community structure
    * for modularity/label-prop). ~40 edges/community: nComm = 750
    * matches the sf0.1 strict graph's ~30k edges (1×); 75 000 ≈ 100×.
    * Entirely hash-driven — no RNG, bit-identical across runs — and
    * generated distributed (one `range` + in-row pair explode, no
    * driver-side materialization). Consumed via
    * `spark.graft.graphEdgesPath` (see Graphs.strictEdges). */
  private def graphGen(s: SparkSession, dst: String, nComm: Int): Unit = {
    val k = 12
    val within = s.range(nComm.toLong).selectExpr("id AS c")
      .selectExpr("c",
        s"explode(flatten(transform(sequence(0, ${k - 2}), i -> " +
          s"transform(sequence(i + 1, ${k - 1}), j -> " +
          "struct(i AS i, j AS j))))) AS p")
      .selectExpr(s"c * $k + p.i AS a_id", s"c * $k + p.j AS b_id")
      .filter("pmod(xxhash64(a_id, b_id), 10) < 6")
    val bridges = s.range((nComm - 1).toLong)
      .selectExpr(s"id * $k AS a_id", s"(id + 1) * $k AS b_id")
      .filter("pmod(xxhash64(a_id, b_id), 2) = 0")
    within.unionAll(bridges).repartition(32)
      .write.mode("overwrite").parquet(dst)
    println(s"[graphgen] $dst: ${s.read.parquet(dst).count()} edges, " +
      s"$nComm communities")
  }

  /** Round-14 smoke for the conf-free [[graft.api.Graft.dedupClusters]]
    * density routing: run the API entry on <dir>'s en documents and
    * report wall + rows. At the 100×-salted density the call must
    * ROUTE to the banded sketch tier and complete — the exact tier
    * exhausts shuffle disk there (the documented §2.11 boundary); at
    * graded densities it stays exact. The gate decision is printed so
    * the smoke log records which tier actually ran. */
  private def apiDedup(s: SparkSession, dir: String): Unit = {
    val docs = Tables.table(s, dir, "documents")
      .filter(col("lang") === "en").select("doc_id", "text")
    val t0 = System.nanoTime()
    val n = graft.api.Graft.dedupClusters(docs, "doc_id", "text").count()
    val route = s.conf.getOption("spark.graft.lastDedupRoute")
      .getOrElse("?")
    println(f"[apidedup] ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"$n rows, route=$route")
  }

  /** Round-14 smoke for [[graft.api.Graft.connectedComponentsIncremental]]
    * — "cost tracks the batch": the standing corpus (doc_id % 10 ≠ 7)
    * is banded + clustered ONCE (untimed ingest, like the bucketed band
    * table), then the timed daily pass bands only the arrival batch,
    * joins it against the standing bands, and updates the standing
    * labels incrementally. Compared against the timed FULL recluster
    * (candidates + CC over the whole corpus) — the cost the incremental
    * path exists to avoid. */
  private def ccInc(s: SparkSession, dir: String): Unit = {
    import graft.api.Graft
    val docs = Tables.table(s, dir, "documents")
      .filter(col("lang") === "en").select("doc_id", "text")
    val standingDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val batchDocs = docs.filter(col("doc_id") % 10 === 7)
    val nStanding = standingDocs.count(); val nBatch = batchDocs.count()
    // ingest (untimed): standing band table + standing labels
    val corpusBands = Graft.minhashBandRows(standingDocs, "doc_id", "text")
      .localCheckpoint(true)
    val standing = Graft.connectedComponents(
      Graft.minhashCandidates(standingDocs, "doc_id", "text"),
      "a_id", "b_id").localCheckpoint(true)
    // timed daily pass: band the batch ONCE (pinned — the incremental
    // join and the batch-internal self-join both fold it; re-deriving
    // via minhashCandidates would charge a second signature aggregate
    // to the headline number), candidates vs corpus + within batch,
    // incremental label update
    val t0 = System.nanoTime()
    val batchBands = Graft.minhashBandRows(batchDocs, "doc_id", "text")
      .localCheckpoint(true)
    val batchSelf = batchBands.as("x").join(batchBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val batchPairs = Graft
      .minhashIncrementalBanded(corpusBands, batchBands)
      .select(col("new_id").as("a_id"), col("old_id").as("b_id"))
      .unionAll(batchSelf)
    val nInc = Graft.connectedComponentsIncremental(standing, "node_id",
      "component_id", batchPairs, "a_id", "b_id").count()
    val tInc = (System.nanoTime() - t0) / 1e9
    // timed full recluster over the whole corpus (the avoided cost)
    val t1 = System.nanoTime()
    val nFull = Graft.connectedComponents(
      Graft.minhashCandidates(docs, "doc_id", "text"),
      "a_id", "b_id").count()
    val tFull = (System.nanoTime() - t1) / 1e9
    println(f"[ccinc] standing=$nStanding docs, batch=$nBatch docs: " +
      f"incremental $tInc%.2f s ($nInc rows) vs full recluster " +
      f"$tFull%.2f s ($nFull rows)")
  }

  /** Round-15 smoke for the COMPOSED one-call incremental dedup
    * ([[graft.api.Graft.dedupIncremental]]) — the same
    * cost-tracks-the-batch shape as [[ccInc]] but through the single
    * entry point a daily-ingest user actually calls: ingest (untimed)
    * builds the standing bands + labels once; the timed daily pass is
    * ONE dedupIncremental call returning the updated (labels, bands)
    * state. Compared against the timed full recluster it replaces. */
  private def dedupInc(s: SparkSession, dir: String,
                       sketchIngest: Boolean = false): Unit = {
    import graft.api.Graft
    val docs = Tables.table(s, dir, "documents")
      .filter(col("lang") === "en").select("doc_id", "text")
    val standingDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val batchDocs = docs.filter(col("doc_id") % 10 === 7)
    val nStanding = standingDocs.count(); val nBatch = batchDocs.count()
    // ingest (untimed): the standing state pair. At 100×-salted density
    // the candidate-pair full recluster is the documented disk-death
    // class, so the `dedupinc100` variant builds the standing labels
    // via the bucket-star CC over the SAME (8,2) band rows —
    // set-identical components to minhashClusters (the Round14GateSpec
    // pin) at linear edge count, preserving the min-id invariant
    // dedupIncremental relies on; the full-recluster control is
    // skipped for the same reason.
    val bands0 = Graft.minhashBandRows(standingDocs, "doc_id", "text")
      .localCheckpoint(true)
    val labels0 = (if (sketchIngest)
        graft.ops.Sketches.bucketClusters(s, bands0, Seq("band", "bkey"),
          s"smoke_dinc_ingest_${ProcessHandle.current().pid()}")
      else Graft.minhashClusters(standingDocs, "doc_id", "text"))
      .localCheckpoint(true)
    // timed daily pass: the one composed call; counting the labels
    // forces the whole incremental update (the bands side is a lazy
    // union — counted after the timer, it is corpus-sized but
    // shuffle-free and not part of the daily label cost)
    val t0 = System.nanoTime()
    val (l1, b1) = Graft.dedupIncremental(labels0, bands0, batchDocs,
      "doc_id", "text")
    val nLabels = l1.count()
    val tInc = (System.nanoTime() - t0) / 1e9
    val nBands = b1.count()
    // round-16 append shape: the SAME daily pass with changedOnly=true
    // returns batch-sized frames — the label DELTA + the batch's band
    // rows — so the numbers printed here are the daily WRITE volume an
    // O(batch) persist pays (vs the corpus-sized full-state return)
    val t2 = System.nanoTime()
    val (ld, bd) = Graft.dedupIncremental(labels0, bands0, batchDocs,
      "doc_id", "text", changedOnly = true)
    val nDelta = ld.count()
    val tDelta = (System.nanoTime() - t2) / 1e9
    val nBatchBands = bd.count()
    println(f"[dedupinc] append shape (changedOnly): $tDelta%.2f s — " +
      f"daily write volume $nDelta label-delta rows + $nBatchBands " +
      f"batch band rows (vs full-state $nLabels labels + $nBands " +
      "band rows)")
    if (sketchIngest) {
      println(f"[dedupinc] standing=$nStanding docs, batch=$nBatch " +
        f"docs: composed incremental $tInc%.2f s ($nLabels labels, " +
        f"$nBands band rows); full-recluster control skipped (the " +
        "candidate-enumeration class at this density)")
      return
    }
    // timed full recluster (the avoided cost)
    val t1 = System.nanoTime()
    val nFull = Graft.minhashClusters(docs, "doc_id", "text").count()
    val tFull = (System.nanoTime() - t1) / 1e9
    println(f"[dedupinc] standing=$nStanding docs, batch=$nBatch docs: " +
      f"composed incremental $tInc%.2f s ($nLabels labels, " +
      f"$nBands band rows) vs full recluster $tFull%.2f s ($nFull rows)")
  }

  private def gen(s: SparkSession, src: String, dst: String,
                  reps: Int): Unit = {
    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      // via Tables.table: handles the events ns→µs conversion and pins
      // canonical column order
      val base = Tables.table(s, src, name)
      val scaled = (0 until reps).map(k => f(base, k)).reduce(_ unionAll _)
      scaled.repartition(32).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      println(s"[gen] $name: ${base.count()} -> ${scaled.count()} rows")
    }
    def off(c: String, k: Int) = col(c) + lit(k * Off)
    // true dims: shared across replicas
    for (d <- Seq("region", "nation")) {
      s.read.parquet(s"$src/$d.parquet").write.mode("overwrite")
        .parquet(s"$dst/$d.parquet")
      println(s"[gen] $d: copied")
    }
    rep("customer")((df, k) => df.withColumn("c_custkey", off("c_custkey", k)))
    rep("supplier")((df, k) => df.withColumn("s_suppkey", off("s_suppkey", k)))
    rep("part")((df, k) => df.withColumn("p_partkey", off("p_partkey", k)))
    rep("orders")((df, k) => df
      .withColumn("o_orderkey", off("o_orderkey", k))
      .withColumn("o_custkey", off("o_custkey", k)))
    rep("lineitem")((df, k) => df
      .withColumn("l_orderkey", off("l_orderkey", k))
      .withColumn("l_partkey", off("l_partkey", k))
      .withColumn("l_suppkey", off("l_suppkey", k)))
    rep("events")((df, k) => df
      .withColumn("event_id", off("event_id", k))
      .withColumn("user_id", off("user_id", k)))
    rep("documents")((df, k) =>
      if (k == 0) df
      else {
        val salt = ('a' to 'h').map(c => s"zk${k}$c").mkString(" ", " ", "")
        df.withColumn("doc_id", off("doc_id", k))
          .withColumn("text", concat(col("text"), lit(salt)))
          .withColumn("n_chars", col("n_chars") + lit(salt.length.toLong))
      })
    rep("embeddings")((df, k) => df.withColumn("vec_id", off("vec_id", k)))
  }

  private def run(s: SparkSession, dir: String,
                  names: Seq[String]): Unit = {
    // warm shapes at the small SF first (Bench's policy: JIT/codegen is
    // session cost, not operator cost)
    for (n <- names)
      try { SparkEntry.queries(n)(s, "/root/testdata/sf0.001").count() }
      catch { case _: Throwable => () }
    // min-of-2 per key (Bench's timing policy, round-13): single-pass
    // gate numbers charged first-run TARGET-SHAPE codegen and whatever
    // box noise landed on the one pass — every past round's "apparent
    // regression" adjudications re-measured exactly this. The second
    // pass reads the SOURCE data fresh (no df caching), but queries
    // that materialize per-JVM inputs (FileFormats.materialize, the
    // bucketed orders/customer/band tables) pay that ingest write on
    // pass 1 only — their reported min is read-side-only cost. Use
    // SPARK_GRAFT_SINGLE_PASS=1 for ANY ingest-bearing measurement
    // (not just explicit ingest keys), where the first run IS the
    // point.
    val passes =
      if (sys.env.get("SPARK_GRAFT_SINGLE_PASS").contains("1")) 1 else 2
    val results = names.map { n =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = try SparkEntry.queries(n)(s, dir).count()
                   catch { case e: Throwable =>
                     println(s"[run] $n FAILED: ${e.getMessage.take(120)}")
                     -1L }
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      // a fast FAILED pass must not beat a slow successful one (it
      // would record a phantom time and hide the real cost): failed
      // passes sort as +inf, surviving only when every pass failed
      val (sec, rows) = (1 to passes).map(_ => once())
        .minBy(p => if (p._2 < 0) Double.PositiveInfinity else p._1)
      println(f"[run] $n%-24s $sec%8.2f s  $rows%10d rows")
      n -> sec
    }
    println(f"[run] TOTAL ${results.map(_._2).sum}%.2f s over ${names.length} queries")
  }
}
