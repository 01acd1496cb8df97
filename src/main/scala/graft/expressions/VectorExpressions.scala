package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY §2.13/§4.2
  * stretch: a codegen'd Expression beats interpreted higher-order
  * functions, which beat UDFs).
  *
  * Semantics are pinned to the portable definition used by the oracles:
  * a sequential left fold over the 64 lanes, each float widened to double
  * before multiply/accumulate — bit-identical to both the previous
  * zip_with/aggregate formulation and DuckDB's list_sum(list_transform)
  * (so swapping these in cannot move a rounded result).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  // internal-only expression: inputs are always ArrayType(FloatType)
  // columns built by graft.ops.Vectors (no ExpectsInputTypes — the
  // AbstractDataType hierarchy is sql-package-private in Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** popcount(a AND b) over two long-array bitmaps — the set-intersection
  * cardinality for vocabularies too large for a single 64-bit mask
  * (multi-word bitset). Used by the exact near-dup joins: per pair this
  * is W AND+POPCNT instructions instead of a posting-list join. */
case class LongVecAndPopcount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_and_popcount"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Σ xᵢ² in double — squared L2 norm, same fold discipline as
  * [[FloatVecDot]]. */
case class FloatVecNorm2(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fnorm2"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** Common-prefix length IN BYTES of two strings — the front-coding
  * primitive (prefix-compressed sorted runs: dictionary blocks, SSTable
  * key compression). On the fixture's ASCII corpus byte length equals
  * character length, which is what the DuckDB oracle counts via its
  * monotone prefix-equality filter. A codegen'd byte loop per pair
  * replaces the O(n²) substring-comparison spelling an expression chain
  * would need (prefix equality is only expressible there by testing
  * every prefix length). */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_common_prefix_len"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val y = b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n && x(i) == y(i)) i += 1
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |int $i = 0;
         |while ($i < $n && $xb[$i] == $yb[$i]) $i++;
         |${ev.value} = (long) $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
