package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Morton (Z-order) bit interleave of two pre-normalized coordinates:
  * the low `bits` bits of each input alternate in the output
  * (`a` on the odd positions, `b` on the even), so sorting by the
  * result clusters rows that are close in BOTH dimensions.
  *
  * This is the layout primitive behind multi-dimensional data skipping
  * (Delta/Iceberg Z-ORDER): a table laid out by z-value gives parquet
  * row-group min/max ranges that are narrow in every interleaved
  * column, so a predicate on ANY of them prunes — unlike a plain sort,
  * which skips only on the leading column. Inputs must already be
  * range-normalized to [0, 2^bits); [[graft.sources.Layout]] does the
  * min/max scaling.
  */
case class MortonInterleave(left: Expression, right: Expression,
                            bits: Int)
    extends BinaryExpression with ExpectsInputTypes {

  // bits ≤ 31: at 32 the left input's top bit would land on long bit
  // 63 — the SIGN bit — and signed sorting by z would order the upper
  // half of the left range before the lower (z-curve broken exactly at
  // the documented domain edge)
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i + 1)
      z |= ((y >>> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (z, i) = (ctx.freshName("z"), ctx.freshName("i"))
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >>> $i) & 1L) << (2 * $i + 1);
         |  $z |= (($b >>> $i) & 1L) << (2 * $i);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}
