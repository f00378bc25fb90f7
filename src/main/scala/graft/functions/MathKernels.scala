package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** gcd / lcm — the two reference math functions
  * (gtype_numbers.c, catalog postgraph-number-functions.sql.in) Spark has
  * no builtin for. Exact BigInt arithmetic in a kernel; lcm errors on
  * 64-bit overflow like the reference's numeric path would.
  */
object MathKernels {

  case class GcdExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      BigInt(a.asInstanceOf[Number].longValue)
        .gcd(BigInt(b.asInstanceOf[Number].longValue)).toLong
    override protected def withNewChildrenInternal(l: Expression, r: Expression): GcdExpr =
      copy(left = l, right = r)
  }

  case class LcmExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = BigInt(a.asInstanceOf[Number].longValue).abs
      val y = BigInt(b.asInstanceOf[Number].longValue).abs
      if (x == 0 || y == 0) 0L
      else {
        val l = x / x.gcd(y) * y
        require(l.isValidLong, s"lcm overflow: $x, $y")
        l.toLong
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): LcmExpr =
      copy(left = l, right = r)
  }

  def gcd(a: Column, b: Column): Column =
    Bridge.column(GcdExpr(Bridge.expression(a), Bridge.expression(b)))
  def lcm(a: Column, b: Column): Column =
    Bridge.column(LcmExpr(Bridge.expression(a), Bridge.expression(b)))
}
