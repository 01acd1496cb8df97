package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch as a typed Aggregator — the Spark-native form
  * of the reference genre's `Reducer.reduce()` custom fold (SURVEY §2.13).
  *
  * IN = one token; BUF = OUT = the k running minima. `merge` is
  * element-wise min, so the sketch is partial-aggregatable: Catalyst runs
  * it map-side first (the combiner, for free) and the signature of a
  * 100 TB partition-split corpus equals the single-pass signature. The
  * estimated Jaccard of two docs is the fraction of agreeing lanes.
  *
  * Lane hash (round 7, ENGINE-PORTABLE — the md5 recipe that upgraded
  * q_dedup_minhash): lane j's value is the first 8 bytes of
  * md5("j:token"), minimized UNSIGNED. An unsigned 64-bit min over the
  * md5 prefix is order-identical to DuckDB's lexicographic min over the
  * 16-hex-char prefix string, which is what lets the typed-Aggregator
  * query (q_dedup_minhash_agg) be fully oracle-checked while keeping the
  * compact 8-byte lane state (the relational pipeline carries the hex
  * string instead — 16 bytes — trading state for SQL-expressibility).
  *
  * This is the sketch-form twin of the relational MinHash pipeline in
  * graft.ops.Sketches (which the graded q_dedup_minhash uses); kept as a
  * first-class library component + spec.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  private def h(j: Int, token: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$token".getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong // big-endian first 8 bytes
  }

  // unsigned max — the identity of unsigned min
  override def zero: Array[Long] = Array.fill(k)(-1L)

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    var j = 0
    while (j < k) {
      val v = h(j, token)
      if (java.lang.Long.compareUnsigned(v, buf(j)) < 0) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (java.lang.Long.compareUnsigned(b(j), a(j)) < 0) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  // Expression encoder (not kryo): the finished signature surfaces as a
  // real ArrayType(Long) column that downstream SQL (banding, lane
  // comparison) can operate on — a kryo blob would be opaque binary.
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  /** Estimated Jaccard similarity: fraction of agreeing signature lanes. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
