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

/** Index of the best-scoring centroid for a vector: argmax over
  * `dot(v, matrix[c])` with ties to the LOWEST index, NaN scores never
  * winning, and an all-NaN/degenerate row falling back to index 0.
  *
  * The centroid matrix ships as ONE flat row-major `double[]` reference
  * object, so the generated code is two small nested loops regardless of
  * k — this matters more than it looks: unrolling k scores as separate
  * expressions creates a projection whose collapsed generated method
  * exceeds HotSpot's huge-method limit (8000 bytecodes) somewhere around
  * k≈32×dim≈64 once an optimizer rule duplicates it, and HotSpot then
  * SILENTLY refuses to JIT the whole stage — the IVF candidate join ran
  * ~10× slower in the bytecode interpreter with zero warnings. A fused
  * constant-size loop can never hit that cliff, and needs no interpreted
  * `aggregate`-fold fallback for large k either.
  *
  * Callers wanting nearest-by-cosine pre-scale each matrix row by
  * `1/‖c‖` (argmax is invariant to the per-row `1/‖v‖` factor). */
case class NearestCentroid(child: Expression, matrix: Array[Double], k: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = IntegerType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    val isF = elemIsFloat
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0.0
      var i = 0
      if (isF) while (i < n) { acc += arr.getFloat(i).toDouble * matrix(off + i); i += 1 }
      else while (i < n) { acc += arr.getDouble(i) * matrix(off + i); i += 1 }
      if (acc > bestScore) { best = c; bestScore = acc }
      c += 1
    }
    if (best < 0) 0 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroidMatrix", matrix, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int $best = -1;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $v.$get($i)) * $mat[$off + $i];
         |  }
         |  if ($acc > $bestScore) { $best = $c; $bestScore = $acc; }
         |}
         |${ev.value} = ($best < 0) ? 0 : $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

object VectorOps {
  import org.apache.spark.sql.graft.bridge
  import org.apache.spark.sql.functions._

  def vector_dot(a: Column, b: Column): Column =
    bridge.column(VectorDot(bridge.expression(a), bridge.expression(b)))

  def vector_norm(a: Column): Column = sqrt(vector_dot(a, a))

  def nearest_centroid(v: Column, matrix: Array[Double], k: Int, dim: Int): Column =
    bridge.column(NearestCentroid(bridge.expression(v), matrix, k, dim))
}
