package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` / `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates an intermediate array and boxes every element per row — fine
  * for one-off expressions, ruinous inside an ANN scoring join that
  * evaluates millions of pairs. `VectorDot` is a single fused loop over the
  * unboxed ArrayData with whole-stage codegen, no allocation. */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val fa = a.asInstanceOf[ArrayData]
    val fb = b.asInstanceOf[ArrayData]
    val n = math.min(fa.numElements(), fb.numElements())
    var acc = 0.0
    var i = 0
    if (elemIsFloat(left) && elemIsFloat(right)) {
      while (i < n) { acc += fa.getFloat(i).toDouble * fb.getFloat(i).toDouble; i += 1 }
    } else if (elemIsFloat(left)) {
      while (i < n) { acc += fa.getFloat(i).toDouble * fb.getDouble(i); i += 1 }
    } else if (elemIsFloat(right)) {
      while (i < n) { acc += fa.getDouble(i) * fb.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += fa.getDouble(i) * fb.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getB = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
  override def prettyName: String = "vector_dot"
}

object VectorOps {
  import org.apache.spark.sql.graft.bridge
  import org.apache.spark.sql.functions._

  def vector_dot(a: Column, b: Column): Column =
    bridge.column(VectorDot(bridge.expression(a), bridge.expression(b)))

  def vector_norm(a: Column): Column = sqrt(vector_dot(a, a))
}
