package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** End-to-end file-source streaming: events parquet → watermarked
  * tumbling agg → parquet sink, compared against the batch computation
  * over the same data. Append mode only emits windows the watermark has
  * closed, so the comparison excludes the final (still-open) day. */
class FileStreamSpec extends SparkSpec {

  test("file stream tumbling agg matches batch on closed windows") {
    val base = Files.createTempDirectory("graft_stream")
    val srcDir = Files.createDirectory(base.resolve("src"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val agg = EventStreams.tumblingCounts(
      EventStreams.source(spark, srcDir.toString))
    EventStreams.runToParquet(agg, s"$base/out", s"$base/chk")

    val streamed = spark.read.parquet(s"$base/out")
      .select("day", "event_type", "n", "sv").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    val batch = Tables.table(spark, sf, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(col("window.start").as("day"), col("event_type"),
        col("n"), col("sv")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    assert(streamed.nonEmpty)
    // every emitted (closed) window must exactly match its batch twin
    assert(streamed.subsetOf(batch),
      s"streamed-not-in-batch: ${streamed.diff(batch).take(3)}")
    // and only the final watermark-open day may be missing
    val missingDays = batch.diff(streamed).map(_._1).toSeq.distinct
    assert(missingDays.size <= 1, s"too many open windows: $missingDays")
  }

  test("stream-stream signup-purchase join matches the batch join") {
    val base = Files.createTempDirectory("graft_ssj")
    val srcDir = Files.createDirectory(base.resolve("src"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val joined = EventStreams.signupPurchaseJoin(
      EventStreams.source(spark, srcDir.toString))
    EventStreams.runToParquet(joined, s"$base/out", s"$base/chk")

    val streamed = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val e = Tables.table(spark, sf, "events")
      .withColumn("us", org.apache.spark.sql.functions.unix_micros(col("ts")))
    val s1 = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("us").as("s_us"))
    val p1 = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("us").as("p_us"))
    val batch = p1.join(s1, col("pu") === col("su") &&
        col("p_us") >= col("s_us") &&
        col("p_us") <= col("s_us") + 3600L * 1000000L)
      .select(col("pu"), col("s_us"), col("p_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // inner-join matches emit in the batch they match; one AvailableNow
    // pass over one file sees everything → exact equality
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
  }

  test("flatMapGroupsWithState sessionization matches batch sessions") {
    val base = Files.createTempDirectory("graft_sess")
    val srcDir = Files.createDirectory(base.resolve("src"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val sessions = EventStreams.sessionize(
      EventStreams.source(spark, srcDir.toString))
    EventStreams.runToParquet(sessions.toDF(), s"$base/out", s"$base/chk")

    val streamed = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch twin: the lag + cumulative-sum sessionization
    // (columns: user_id, sess_id, n_events, start_us, dur_us)
    val batch = SparkEntry.queries("q_events_session")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(3) + r.getLong(4),
        r.getLong(2))) // (user, start_us, end_us, n)
      .toSet

    assert(streamed.nonEmpty, "no sessions emitted")
    // every emitted (closed) session must exactly match a batch session
    assert(streamed.subsetOf(batch),
      s"streamed-not-in-batch: ${streamed.diff(batch).take(3)}")
    // emission policy: a user's backlog drains together once the
    // watermark clears their NEWEST session's close window — so every
    // session of every such user must emit
    val gapUs = 30L * 60 * 1000000
    val wmUs = Tables.table(spark, sf, "events")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.unix_micros(col("ts"))))
      .head().getLong(0) - 3600L * 1000000
    val newestEnd = batch.groupBy(_._1).map { case (u, ss) =>
      u -> ss.map(_._3).max
    }
    val mustEmit = batch.filter { case (u, _, _, _) =>
      newestEnd(u) + gapUs < wmUs
    }
    assert(mustEmit.subsetOf(streamed),
      s"closed-but-unemitted: ${mustEmit.diff(streamed).take(3)}")
  }

  test("dropDuplicatesWithinWatermark over the fixture matches batch keys") {
    val base = Files.createTempDirectory("graft_ddwm")
    val srcDir = Files.createDirectory(base.resolve("src"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val dedup = EventStreams.dedupWithinWatermark(
      EventStreams.source(spark, srcDir.toString))
    EventStreams.runToParquet(dedup, s"$base/out", s"$base/chk")

    val streamed = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    // batch twin = q_events_late_dedup's key space: exactly one row per
    // (user_id, event_type). One file → one microbatch → no mid-batch
    // state eviction, so the streaming dedup is exact here.
    val batchKeys = SparkEntry.queries("q_events_late_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(batchKeys.distinct.size == batchKeys.size)
    assert(streamed.distinct.size == streamed.size,
      "a key emitted more than once")
    assert(streamed.toSet == batchKeys.toSet,
      s"missing=${batchKeys.toSet.diff(streamed.toSet).take(3)} " +
        s"extra=${streamed.toSet.diff(batchKeys.toSet).take(3)}")
  }
}
