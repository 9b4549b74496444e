package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftshim.GraftShim
import graft.ranges.ZOrder

/** Native Catalyst expressions for Z-order (Morton) keys — the codegen
  * twins of [[graft.ranges.ZOrder]]'s pure bit math. Each is a handful of
  * shift/mask ops inlined into whole-stage codegen, so computing a z key
  * for every row of a 100 TB write (or decoding one on every scan row of a
  * residual filter) costs the same as any arithmetic projection. */
case class Morton2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"morton2 needs (int, int) input, got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.encode(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.ranges.ZOrder.encode($x, $y);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class MortonX(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"morton_x needs bigint input, got $other")
  }
  override def nullSafeEval(z: Any): Any = ZOrder.decodeX(z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, z => s"${ev.value} = graft.ranges.ZOrder.decodeX($z);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MortonY(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"morton_y needs bigint input, got $other")
  }
  override def nullSafeEval(z: Any): Any = ZOrder.decodeY(z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, z => s"${ev.value} = graft.ranges.ZOrder.decodeY($z);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ZOrderExprs {
  def morton2(x: Column, y: Column): Column =
    GraftShim.column(Morton2(GraftShim.expression(x), GraftShim.expression(y)))
  def mortonX(z: Column): Column = GraftShim.column(MortonX(GraftShim.expression(z)))
  def mortonY(z: Column): Column = GraftShim.column(MortonY(GraftShim.expression(z)))
}
