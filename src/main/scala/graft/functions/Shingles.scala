package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles in ONE pass over a token array, output-identical
  * to the HOF formulation in `Dedup.shinglesOf` / `shinglesOfAll`:
  *
  *  - `size(tokens) >= n`: one shingle per position, tokens joined with a
  *    single space (`concat_ws` semantics: null tokens are skipped);
  *  - shorter arrays: ONE shingle joining all tokens (never an empty
  *    result, so a short doc still lands in a minhash bucket);
  *  - `distinct = true` dedups preserving FIRST-occurrence order,
  *    matching `array_distinct`.
  *
  * The HOF form evaluates its lambda interpreted per position — n boxed
  * `element_at` calls plus a `concat_ws` per shingle — and that shingle
  * build feeds every minhash/jaccard/winnowing operator. Here it is a
  * compiled sliding-window loop; CodegenFallback is deliberate (the
  * per-row eval does the whole loop, and the expression can never
  * contribute to a huge-method codegen blowup). */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  private val space = UTF8String.fromString(" ")

  // HOF parity: a NULL token array falls into the `otherwise` branch of
  // the original formulation (size(null) is null → falsy) and produces
  // [""] — never a null result
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array[Any](UTF8String.fromString("")))
    else nullSafeEval(v)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    def tok(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    if (m < n) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = tok(i); i += 1 }
      return new GenericArrayData(Array[Any](UTF8String.concatWs(space, all: _*)))
    }
    val count = m - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tok(i + j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tok(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

object Shingles {
  import org.apache.spark.sql.graft.bridge

  def word_shingles(tokens: Column, n: Int, distinct: Boolean): Column =
    bridge.column(WordShingles(bridge.expression(tokens), n, distinct))
}
