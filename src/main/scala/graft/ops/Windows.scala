package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.5) and event-time / streaming-shaped
  * operators in batch mode (SURVEY §2.9).
  *
  * In the MR genre every one of these is the secondary-sort pattern: a
  * composite (key, order) shuffle key, a grouping comparator, and a
  * hand-rolled accumulator in the reducer. Here they are declarative
  * `Window` specs — Spark plans one sort per (partitionBy, orderBy) and
  * evaluates all frames in a single pass.
  *
  * Determinism: window orderings over `events` use epoch-microsecond longs
  * (unix_micros) with event_id tie-breaks, matching the oracle's epoch_us
  * truncation of the ns-precision source (SURVEY §1.2.1); raw sub-second
  * timestamps are never emitted.
  */
object Windows {

  // ---- §2.5 window functions -------------------------------------------

  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orderedAll(t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk")))
  }

  /** Top-3 per group — the secondary-sort + "emit first k" reducer idiom. */
  def qWindowTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orderedAll(t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3))
  }

  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedAll(t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      round(sum(col("o_totalprice")).over(w), 4).as("running")))
  }

  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    orderedAll(e.select(col("event_id"), col("user_id"),
      (col("us") - lag(col("us"), 1).over(w)).as("gap_us")))
  }

  /** RANGE frame (preceding 1h by value, not row count) over epoch seconds. */
  def qWindowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("ts_sec", col("ts").cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec").asc)
      .rangeBetween(-3600, Window.currentRow)
    orderedAll(e.select(col("event_id"), col("user_id"), col("ts_sec"),
      round(avg(col("value")).over(w), 4).as("avg_1h")))
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist per
    * priority class. The rank orderings are made total with the orderkey
    * tie-break so both engines assign identical bucket boundaries. */
  def qWindowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orderedAll(t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(4).over(w).cast("long").as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cdist")))
  }

  /** Frame-positional window functions: first / last / 2nd order per
    * customer over the full-partition frame. */
  def qWindowFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orderedAll(t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(w).as("first_ok"),
      last(col("o_orderkey")).over(w).as("last_ok"),
      nth_value(col("o_orderkey"), 2).over(w).as("second_ok")))
  }

  // ---- §2.9 event-time operators (batch semantics) ---------------------

  /** Tumbling 1-day windows via the streaming-shaped window() primitive. */
  def qEventsTumbling(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(col("window.start").as("day"),
        col("event_type"), col("n"), col("sv")))

  /** Sliding 1h/30min windows — each event multi-emits into 2 windows
    * (the MR multi-emit trick, done by window() natively). */
  def qEventsSliding(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("win_s"), col("n")))

  /** Gap-based session-id assignment — the CORE shared by
    * [[qEventsSession]] and `graft.api.Graft.sessionize`: lag the
    * per-key order column, mark rows whose gap from the predecessor
    * exceeds `gapUs`, and running-sum the marks into a 1-based
    * session_id. ONE hash exchange on the key + one per-key sort (both
    * window frames ride the same (partitionBy, orderBy) spec, so Spark
    * plans a single pass); per-key row counts bound the sort, so a
    * 100 TB run is safe whenever no single key's history dwarfs an
    * executor — the same contract as any keyed window. `tieCols` make
    * the ordering (and therefore the ids) deterministic under equal
    * timestamps. */
  private[graft] def sessionIds(df: DataFrame, keyCol: String,
      usCol: String, gapUs: Long, tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(usCol) +: tieCols.map(col)).map(_.asc): _*)
    df.withColumn("__prev_us", lag(col(usCol), 1).over(w))
      .withColumn("__new_sess",
        when(col("__prev_us").isNull ||
          col(usCol) - col("__prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("__new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_us", "__new_sess")
  }

  /** Sessionization (30-min inactivity gap) via the lag + cumulative-sum
    * session-id idiom; streaming twin session_window() is unit-test-only. */
  def qEventsSession(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val sess = sessionIds(e, "user_id", "us", 1800L * 1000000L,
      Seq("event_id")).withColumnRenamed("session_id", "sess_id")
    orderedAll(sess.groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
        (max(col("us")) - min(col("us"))).as("dur_us")))
  }

  /** Late-data upsert semantics: keep the latest event per (user, type). */
  def qEventsLateDedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    orderedAll(e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "us", "value"))
  }

  /** Relative-position window functions (§2.16): percent_rank + cume_dist
    * per priority — the normalized-rank pair next to rank/ntile. Unique
    * tie-break (totalprice, orderkey) so both ranks are deterministic;
    * round(…,4) on the only emitted floats. */
  def qWindowPercentRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    orderedAll(t(s, dir, "orders").filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd")))
  }

  /** Weekly cohort retention (§2.16): per week, distinct active users and
    * how many are also active the FOLLOWING week — the cohort self-join
    * that product and training-data freshness analytics run constantly.
    * Active-set dedup first (distinct (user, week) — one mergeable
    * aggregate), then the week-shifted equi self-join; both sides are the
    * compact distinct sets, never raw events. */
  def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    val wk = t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("wk"))
      .distinct()
    val nxt = wk.select(col("user_id").as("u2"), col("wk").as("wk2"))
    orderedAll(wk.join(nxt,
        col("u2") === col("user_id") && col("wk2") === col("wk") + 1, "left")
      .groupBy("wk")
      .agg(countDistinct(col("user_id")).as("n_active"),
        countDistinct(col("u2")).as("n_retained")))
  }

  /** Binned interval join (§2.16): every (purchase, click) pair by the
    * same user within ±30 min. The naive formulation is a non-equi time
    * predicate — an O(n·m) nested-loop at scale. Binning makes it an
    * EQUI-join: clicks land in their 30-min bin, purchases probe their
    * own bin ± 1 (|Δt| ≤ W ⇒ the click's bin is one of those three), the
    * join key is (user, bin), and the exact |Δt| ≤ W predicate verifies
    * inside the bucket. Each pair matches exactly once (a click has ONE
    * bin), so no distinct is needed. This is the standard range-join
    * optimization: shuffle-local work proportional to true matches, not
    * |purchases|×|clicks|. Plan shape (no BNLJ) asserted in PlanSpec. */
  def qJoinTimeWindow(s: SparkSession, dir: String): DataFrame = {
    val winUs = 1800L * 1000000L
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("us").as("cus"))
      .withColumn("bin", expr(s"cus div $winUs"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("pus"))
      .withColumn("bin", explode(array(
        expr(s"pus div $winUs - 1"), expr(s"pus div $winUs"),
        expr(s"pus div $winUs + 1"))))
    orderedAll(purchases.join(clicks,
        purchases("user_id") === clicks("cu") &&
          purchases("bin") === clicks("bin") &&
          abs(col("cus") - col("pus")) <= winUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("cus") - col("pus"))).as("min_gap_us")))
  }

  /** As-of join (SURVEY §2.3): each event paired with the user's most
    * recent prior signup. Spark has no native as-of join; expressed as the
    * union-tag + running-max window idiom — max(signup ts) over all
    * strictly-preceding rows in (us, event_id) order. One sort, no
    * self-join, scales as a single window pass per user partition. */
  def qJoinAsof(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    orderedAll(e.select(col("event_id"), col("user_id"), col("event_type"),
      max(when(col("event_type") === "signup", col("us"))).over(w)
        .as("last_signup_us")))
  }

  /** FORWARD as-of join (§2.95): each event paired with the user's next
    * STRICTLY LATER purchase — the mirror of [[qJoinAsof]] (which looks
    * back) and the primitive behind conversion attribution windows
    * ("what did this click lead to"). Same union-free window idiom,
    * frame flipped: min(purchase ts) over all strictly-following rows in
    * (us, event_id) order. One sort per user partition, no self-join. */
  def qJoinAsofForward(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    orderedAll(e.select(col("event_id"), col("user_id"), col("event_type"),
      min(when(col("event_type") === "purchase", col("us"))).over(w)
        .as("next_purchase_us")))
  }

  /** Nearest as-of join (§2.97): each event matched to the CLOSEST
    * purchase of the same user in either direction — the third member
    * of the as-of family (backward [[qJoinAsof]], forward
    * [[qJoinAsofForward]]); a sensor-fusion/attribution staple when
    * causality is unknown. Both candidate timestamps come from the
    * SAME user-sharded (us, event_id) ordering — one window frame
    * looking strictly back, one strictly forward — so the whole query
    * is one shuffle; ties (equidistant) resolve to the EARLIER
    * purchase, and same-µs purchases at other row positions count as
    * the strictly-prev/next row just as the two parent queries define
    * it. nearest_us is the absolute distance; side says which one won
    * (NULL when the user has no purchase at all). */
  def qJoinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val isP = when(col("event_type") === "purchase", col("us"))
    orderedAll(e
      .withColumn("prev_us",
        max(isP).over(base.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_us",
        min(isP).over(base.rowsBetween(1, Window.unboundedFollowing)))
      .withColumn("d_prev", col("us") - col("prev_us"))
      .withColumn("d_next", col("next_us") - col("us"))
      .withColumn("nearest_us", least(col("d_prev"), col("d_next")))
      .withColumn("side", expr(
        "CASE WHEN d_prev IS NULL AND d_next IS NULL THEN NULL " +
          "WHEN d_next IS NULL THEN 'prev' " +
          "WHEN d_prev IS NULL THEN 'next' " +
          "WHEN d_prev <= d_next THEN 'prev' ELSE 'next' END"))
      .select("event_id", "user_id", "nearest_us", "side"))
  }

  /** Z-score outliers (§2.17): events whose value is > 2.5σ from the
    * per-type mean — the metric-anomaly sweep of every event pipeline.
    * The moments go through EXACT decimal sums (value is a 2-dp column,
    * so value and value² are exact in DECIMAL; the double images of the
    * sums are then bit-identical in both engines under any partitioning),
    * and the z expression mirrors the oracle operator-for-operator, so
    * even the |z| > 2.5 boundary decision is deterministic — a raw
    * double-sum mean would flap rows near the threshold. Near-constant
    * types could make s2/n − mean² a tiny NEGATIVE double (float
    * cancellation): Spark sqrt(neg) = NaN (rows silently drop) but
    * DuckDB sqrt(neg) raises, so both sides filter to variance > 0 —
    * the moments are bit-identical doubles, hence so is that decision.
    * Topology: one tiny per-type agg broadcast back onto the scan. */
  def qEventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val dv = col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val m = e.groupBy("event_type").agg(
      sum(dv).cast("double").as("s1"),
      sum(dv * dv).cast("double").as("s2"),
      count(lit(1)).as("n"))
    val mean = col("s1") / col("n")
    val variance = col("s2") / col("n") - mean * mean
    val z = (col("value") - mean) / sqrt(variance)
    orderedAll(e.join(broadcast(m), "event_type")
      .filter(variance > 0d)
      .withColumn("z", z)
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 4).as("z")))
  }

  /** Robust (MAD) outliers (§2.17): events whose |value − median| exceeds
    * 3 × 1.4826 × MAD per event_type — the robust twin of
    * [[qEventsAnomaly]]: the z-score sweep breaks when the outliers
    * themselves inflate σ; median/MAD does not.
    *
    * The entire keep/drop decision is EXACT integer-scaled decimal
    * arithmetic — no float boundary can flap a row. value is a 2-dp
    * column, so everything is carried ×2 (then ×4 for the MAD level) in
    * DECIMAL: the rank-selected median of n values is sum(selected)×
    * (1 or 2) — the rows with 2·rn ∈ [n, n+2] are the middle one (n odd)
    * or two (n even) — giving med2 = 2·median exactly; absolute
    * deviations ad2 = |2v − med2| stay 2-dp; the same selection on ad2
    * gives mad22 = 4·MAD; and the cut |v−med| > 3·1.4826·MAD becomes
    * 2·ad2 > 4.4478·mad22 in pure decimal. Two sorted window passes per
    * event_type partition (the exact-median cost); at 100 TB the same
    * query swaps in approx_percentile sketches, trading the exactness
    * this oracle check is for. */
  def qAnomalyMad(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        col("value").cast(dec).as("dv"))
    val wc = Window.partitionBy(col("event_type"))
    // asc_nulls_last: DuckDB's ORDER BY default is NULLS LAST — a NULL
    // value would otherwise shift every rank in the partition and
    // silently de-sync the median-row selection (orderedAll precedent).
    def ranked(df: DataFrame, ord: Column): DataFrame = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(ord.asc_nulls_last, col("event_id").asc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
    }
    def mid2(r: DataFrame, v: Column): DataFrame = r
      .filter(col("rn") * 2 >= col("n") && col("rn") * 2 <= col("n") + 2)
      .groupBy("event_type")
      .agg((sum(v) * when(max(col("n")) % 2 === 1, 2).otherwise(1))
        .as("m2"))
    val med = mid2(ranked(e, col("value")), col("dv"))
      .withColumnRenamed("m2", "med2")
    val wm = e.join(broadcast(med), "event_type")
      .withColumn("ad2", abs(col("dv") * 2 - col("med2")))
    // Both the MAD aggregate and the output rows hang off the SAME
    // ranked(wm) lineage; Catalyst column-prunes the unused rn/n off the
    // output branch, so only the MAD branch pays the second window sort —
    // the output rows are a plain scan ⋈ med ⋈ mad.
    val wmR = ranked(wm, col("ad2"))
    val mad = mid2(wmR, col("ad2"))
      .withColumnRenamed("m2", "mad22")
    orderedAll(wmR.drop("rn", "n").join(broadcast(mad), "event_type")
      .filter(col("mad22") > 0 &&
        col("ad2") * 2 > expr("CAST(4.4478 AS DECIMAL(5,4))") * col("mad22"))
      .select(col("event_id"), col("event_type"), col("value"),
        (col("med2").cast("double") / 2).as("med"),
        (col("mad22").cast("double") / 4).as("mad"),
        round(col("ad2").cast("double") * 2 /
          (lit(1.4826) * col("mad22").cast("double")), 4).as("robust_z")))
  }

  /** Gaps-and-islands (§2.18): runs of CONSECUTIVE active days per user
    * (streaks ≥ 7 days) — the classic sequential-SQL pattern behind
    * engagement streaks and SLA-window analysis, and a different shape
    * from [[qEventsSession]]'s gap-based sessionization: islands group by
    * the day−row_number invariant (constant within a consecutive run),
    * so the whole detection is one window + one aggregate with pure
    * integer day indexes (epoch-µs floor-div — exact in both engines,
    * no calendar/timezone surface). Partitioned by user: the 100 TB
    * sharding axis, no global sort anywhere. */
  def qIslands(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    orderedAll(d
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(min(col("day")).as("start_day"), count(lit(1)).as("len"))
      .filter(col("len") >= 7)
      .select(col("user_id"), col("start_day"), col("len")))
  }

  /** Lag-1 autocorrelation of the daily value series per event_type
    * (§2.18) — the first time-series diagnostic of any metrics pipeline
    * (is today predictive of tomorrow?). Daily totals stay in EXACT
    * DECIMAL (value is 2-dp), consecutive days pair through one integer
    * equi-join (day+1 — no window, no sort), and all five Pearson
    * moments over the pairs are exact decimal sums; the formula is then
    * one mirrored double expression, so the correlation is
    * bit-deterministic under any partitioning. Scan → mergeable daily
    * agg → tiny self-join → mergeable moment agg. */
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(col("value").cast(dec)).as("dv"))
    val a = daily.select(col("event_type"), col("day"),
      col("dv").cast(dec).as("x"))
    val b = daily.select(col("event_type"), (col("day") - 1).as("day"),
      col("dv").cast(dec).as("y"))
    val m = a.join(b, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
    orderedAll(m
      // same sqrt-of-cancellation-residue guard as qEventsAnomaly: the
      // variance terms are identical doubles in both engines, so this
      // decision is deterministic; without it Spark NaN-drops where
      // DuckDB raises.
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0d &&
        col("n") * col("syy") - col("sy") * col("sy") > 0d)
      .select(col("event_type"), col("n").cast("long").as("n_pairs"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 4)
          .as("autocorr")))
  }

  /** Event-type transition matrix (§2.18): P(next | current) over each
    * user's time-ordered event sequence — the first-order Markov model
    * of behavioral analytics (and the event-stream cousin of
    * [[graft.ops.Text.qNgramLm]]'s text bigrams). The sequence order is
    * the library's standard deterministic secondary sort (epoch-µs +
    * event_id tie-break); transition counts are integers and the
    * probability is one int/int division. One user-partitioned lag
    * window (the sharding axis) + two mergeable aggregates. */
  def qMarkov(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val tr = e.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy("from_type").agg(sum(col("n")).as("tot"))
    orderedAll(tr.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("tot"),
        round(col("n").cast("double") / col("tot"), 4).as("p")))
  }

  /** Last-observation-carried-forward via IGNORE NULLS (§2.45): per
    * user, every event carries the cents of the user's most recent
    * 'purchase' at-or-before it — `last(x, ignoreNulls)` over a prefix
    * frame, the window-dialect feature (IGNORE NULLS) that separates
    * real LOCF from a self-join workaround. Distinct from q_gap_fill
    * (date-spine densification): LOCF annotates EXISTING rows. One
    * user-partitioned window, the natural 100 TB partition axis. */
  def qWindowLocf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedAll(t(s, dir, "events")
      .withColumn("pv", expr(
        "CASE WHEN event_type = 'purchase' " +
          "THEN CAST(round(value * 100) AS BIGINT) END"))
      .select(col("event_id"), col("user_id"),
        last(col("pv"), ignoreNulls = true).over(w).as("last_purchase_c")))
  }

  /** As-of join with direction AND tolerance (§2.47) — the pandas
    * merge_asof surface q_join_asof's plain backward form lacks: per
    * event, the user's most recent signup within 24 h back (backward +
    * tolerance; NULL if the last signup is older) and the next error
    * within 1 h forward. Both directions are prefix/suffix windows over
    * the user axis with the tolerance applied as a post-filter on the
    * matched timestamp — no join, no spine, the window spelling that
    * scales with the per-user partition. */
  def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
    val back = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    orderedAll(e
      .withColumn("prev_signup_us",
        max(when(col("event_type") === "signup", col("us"))).over(back))
      .withColumn("next_error_us",
        min(when(col("event_type") === "error", col("us"))).over(fwd))
      .select(col("event_id"), col("user_id"),
        when(col("us") - col("prev_signup_us") <= 86400000000L,
          col("prev_signup_us")).as("signup_24h_us"),
        when(col("next_error_us") - col("us") <= 3600000000L,
          col("next_error_us")).as("error_1h_us")))
  }
}
