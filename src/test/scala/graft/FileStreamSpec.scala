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
}
