package graft

import graft.functions.{ParsePyLiteral, PyFloatRepr, VectorDot}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT parse_py_literal(c) ...")` works alongside the
  * Column API. Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, or call
  * `GraftExtensions.register(spark)` on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("parse_py_literal",
      info("parse_py_literal", "normalizes a python-literal string to JSON"),
      (args: Seq[Expression]) => ParsePyLiteral(args.head)),
    ("py_float_repr",
      info("py_float_repr", "renders a double exactly like python str()"),
      (args: Seq[Expression]) => PyFloatRepr(args.head)),
    ("vector_dot",
      info("vector_dot", "fused-loop dot product of two float/double arrays"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
