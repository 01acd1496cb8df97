package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 pipeline-tuning sweeps (SURVEY §2.73): chunk-size packing
  * efficiency (how much context window a chunker wastes at each
  * size), watermark-delay lateness accounting (what each candidate
  * watermark would drop, on the q_late_events arrival order), and
  * per-type activity-gap profiling (silent hours and the longest
  * outage — the monitoring readout behind q_gap_fill's value
  * interpolation). Config axes are literal rows crossed in; facts
  * collapse first. */
object Tuning {

  /** Chunk-size sweep (§2.73): for chunk sizes 128/256/512 tokens,
    * the total chunk count, padded-slot waste, and waste share bp if
    * every doc is chunked independently (ceil division — the padding
    * a packer then tries to claw back; q_pack_chunks is the packed
    * counterpart at one size). One scan; the size axis is 3 literal
    * rows crossed onto per-doc token counts. */
  def qChunkSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sizes = Seq(128L, 256L, 512L).toDF("chunk")
    orderedAll(t(s, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("tok"))
      .crossJoin(broadcast(sizes))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").cast("long").as("tokens"),
        sum(expr("(tok + chunk - 1) div chunk")).cast("long")
          .as("n_chunks"))
      .withColumn("waste", expr("n_chunks * chunk - tokens"))
      .withColumn("waste_bp", expr(
        "waste * 10000 div (n_chunks * chunk)"))
      .select("chunk", "n_docs", "tokens", "n_chunks", "waste",
        "waste_bp"))
  }

  /** Watermark-delay sweep (§2.73): for delays 1/10/60 minutes, how
    * many events each candidate watermark would drop — lateness is
    * the q_late_events contract (µs behind the per-type running max
    * under the deterministic md5 arrival order). ONE window pass
    * computes lateness; the delay axis is 3 literal rows over the
    * per-event lateness. */
  def qWatermarkSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("event_type")
      .orderBy("arrival", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = t(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("arrival", md5(col("event_id").cast("string")))
      .withColumn("late_us",
        greatest(coalesce(max("us").over(w) - col("us"), lit(0L)),
          lit(0L)))
    val delays = Seq(60000000L, 600000000L, 3600000000L)
      .toDF("delay_us")
    orderedAll(late.crossJoin(broadcast(delays))
      .groupBy("event_type", "delay_us")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > col("delay_us"), 1L).otherwise(0L))
          .cast("long").as("n_dropped"))
      .withColumn("drop_bp", expr("n_dropped * 10000 div n_events")))
  }

  /** Activity-gap profile (§2.73): per event type over its own
    * first..last-hour span — active hours, silent hours, silent share
    * bp, and the longest silent run (max gap between consecutive
    * ACTIVE hours, minus one) — the monitoring readout that catches a
    * dead collector. Facts collapse to distinct (type, hour) rows;
    * the gap window runs over that hour table. */
  def qGapHours(s: SparkSession, dir: String): DataFrame = {
    val hours = t(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    orderedAll(hours
      .withColumn("prev_h", lag(col("h"), 1).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("active_hours"),
        (max("h") - min("h") + 1L).as("span_hours"),
        max(coalesce(col("h") - col("prev_h") - 1L, lit(0L)))
          .as("max_gap"))
      .withColumn("gap_hours", expr("span_hours - active_hours"))
      .withColumn("gap_bp", expr(
        "(span_hours - active_hours) * 10000 div span_hours"))
      .select("event_type", "span_hours", "active_hours", "gap_hours",
        "gap_bp", "max_gap"))
  }
}
