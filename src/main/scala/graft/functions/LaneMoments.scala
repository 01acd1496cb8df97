package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All-pairs lane moment matrix as one mergeable aggregate (r16
  * optimization for §2.64 q_dim_corr).
  *
  * Input: one BIGINT lane array (length ≤ d) per row. Output: ONE row —
  * the array of all d·(d−1)/2 upper-triangle pair moments
  * `(i, j, n, sx, sy, qx, qy, sxy)` with 1-based lane indices, exactly
  * the table the old in-row pair explode + groupBy(i, j) produced:
  *
  *   - `n`   = total input rows (the explode emitted every pair struct
  *             for every row, null lanes included — count(1) semantics);
  *   - `sx`  = Σ x_i over rows where lane i is present (null-skipping
  *             BIGINT sum; NULL when no row has lane i — sum-over-empty);
  *   - `qx`  = Σ x_i² likewise; `sy`/`qy` the j-side twins;
  *   - `sxy` = Σ x_i·x_j over rows where BOTH lanes are present (NULL
  *             when no row has both).
  *
  * A lane is "absent" when the input array is NULL, shorter than the
  * index, or NULL at it — mirroring `xu[i-1]` under non-ANSI
  * GetArrayItem, which is what the old explode evaluated.
  *
  * Why an aggregate instead of the explode: the explode materializes
  * P = d(d−1)/2 struct rows PER INPUT ROW (2016× row blowup at d = 64)
  * and pushes them through a 2016-group hash aggregate; this buffer
  * does the same multiply-adds in place and ships ONE ~(3d+2P)-long
  * buffer per partition (≈33 KiB at d = 64, independent of row count) —
  * the partial-mergeable one-pass shape a 100 TB corpus needs. Exact
  * integer arithmetic throughout; order-independent, so the result is
  * identical under any partitioning.
  */
case class LaneMoments(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val nPairs = d * (d - 1) / 2
  // layout: [0]=nRows | cnt(i) d | s(i) d | q(i) d | cntp(k) P | sp(k) P
  private val oCnt = 1
  private val oS = 1 + d
  private val oQ = 1 + 2 * d
  private val oCp = 1 + 3 * d
  private val oSp = 1 + 3 * d + nPairs
  private val bufLen = 1 + 3 * d + 2 * nPairs

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    buf(0) += 1L
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), d)
      // local dense copy with a presence mask: the pair loop reads each
      // element d/2 times on average
      val x = new Array[Long](d)
      val ok = new Array[Boolean](d)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val xi = arr.getLong(i)
          x(i) = xi; ok(i) = true
          buf(oCnt + i) += 1L
          buf(oS + i) += xi
          buf(oQ + i) += xi * xi
        }
        i += 1
      }
      var k = 0
      i = 0
      while (i < d - 1) {
        if (ok(i)) {
          val xi = x(i)
          var j = i + 1
          while (j < d) {
            if (ok(j)) {
              buf(oCp + k + (j - i - 1)) += 1L
              buf(oSp + k + (j - i - 1)) += xi * x(j)
            }
            j += 1
          }
        }
        k += d - i - 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](nPairs)
    var k = 0
    var i = 0
    while (i < d - 1) {
      var j = i + 1
      while (j < d) {
        val row = new Array[Any](8)
        row(0) = (i + 1).toLong
        row(1) = (j + 1).toLong
        row(2) = buf(0)
        row(3) = if (buf(oCnt + i) > 0) java.lang.Long.valueOf(buf(oS + i)) else null
        row(4) = if (buf(oCnt + j) > 0) java.lang.Long.valueOf(buf(oS + j)) else null
        row(5) = if (buf(oCnt + i) > 0) java.lang.Long.valueOf(buf(oQ + i)) else null
        row(6) = if (buf(oCnt + j) > 0) java.lang.Long.valueOf(buf(oQ + j)) else null
        row(7) = if (buf(oCp + k) > 0) java.lang.Long.valueOf(buf(oSp + k)) else null
        out(k) = InternalRow.fromSeq(row.toIndexedSeq)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  private val pairStruct = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", LongType, nullable = true),
    StructField("sy", LongType, nullable = true),
    StructField("qx", LongType, nullable = true),
    StructField("qy", LongType, nullable = true),
    StructField("sxy", LongType, nullable = true)))

  override def dataType: DataType = ArrayType(pairStruct, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_lane_moments"

  override def withNewMutableAggBufferOffset(newOffset: Int): LaneMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LaneMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LaneMoments =
    copy(child = newChildren.head)
}

object LaneMoments {
  /** Column entry point: `agg(LaneMoments.moments(col, 64))`. */
  def moments(c: Column, d: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      LaneMoments(org.apache.spark.sql.GraftSql.expression(c), d)
        .toAggregateExpression())
}
