package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All MinHash signature lanes in ONE pass over the shingle array,
  * bit-identical to `array(array_min(transform(sh, s => xxhash64(s, i))))`
  * for i in 0 until numHashes.
  *
  * Spark's `xxhash64(s, lit(i))` folds its children left-to-right from the
  * seed 42: `hashInt(i, hashUnsafeBytes(s, 42))` (`lit(i)` is an INT —
  * empirically verified against the SQL function). Exploiting that, each
  * shingle's string hash is computed ONCE and every lane derives from it
  * with a single cheap `hashInt` — versus the HOF formulation, which
  * builds numHashes intermediate arrays per row and evaluates the lambda
  * INTERPRETED per (shingle × lane): ~26M boxed evaluations at
  * sf0.1 × 32 lanes, the dominant cost of the whole minhash family
  * (q25/q41/q46). Here it is numShingles string hashes + cheap mixes in
  * compiled Scala.
  *
  * CodegenFallback is deliberate: the per-ROW eval call does the entire
  * fused loop, so the one boxed call per document is noise, and the
  * expression can never contribute to a huge-method codegen blowup.
  *
  * Null handling: a null shingle ARRAY — or an EMPTY one, or one holding
  * only null elements — yields a null signature. (The HOF form yields an
  * array of null lanes for an empty input; both mean "no signature", and
  * null is the honest answer for a public helper — Long.MaxValue lanes
  * would look like a real signature and silently bucket all empty docs
  * together. Internal callers guarantee ≥ 1 element via `shinglesOf`.)
  * Null ELEMENTS inside the array are skipped. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    var any = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var l = 0
        while (l < numHashes) {
          val h = XXH64.hashInt(l, base)
          if (h < mins(l)) mins(l) = h
          l += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash of a token ARRAY in one pass, value-identical to the
  * explode → groupBy → 64-bit-vote-sum formulation with the default
  * `xxhash64` token hash (`hashUnsafeBytes(bytes, 42)` per token; every
  * occurrence votes, ties → 0 bit). Beyond the per-element win, this
  * removes the (doc, token-hash) SHUFFLE the grouped formulation pays —
  * the signature becomes a pure projection, like the minhash path. */
case class SimHashBits(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
  override def prettyName: String = "simhash_bits"
}

/** 64-bit SimHash of a token ARRAY with the PORTABLE md5-60 token hash
  * ([[graft.operators.Dedup.md5Hash60]]: decimal value of the first 15
  * hex chars of md5 = first 8 big-endian digest bytes >>> 4), value-
  * identical to the explode → md5Hash60 → groupBy → 64-bit-vote-sum
  * formulation (spec-asserted on real testdata). Same win as
  * [[SimHashBits]]: the signature becomes a pure per-row projection —
  * no (doc, token-hash) explode and no 64-column vote shuffle — while
  * staying bit-replayable in any engine with md5 (bits 60–63 vote
  * negative for every token, exactly like the grouped form's
  * shiftright ≥ 60). */
case class SimHashBitsMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val md = mdLocal.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
        h = h >>> 4 // first 15 hex chars = first 60 bits
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHashBitsMd5 =
    copy(child = c)
  override def prettyName: String = "simhash_bits_md5"
}

object MinHashSig {
  import org.apache.spark.sql.graft.bridge

  def minhash_signature(shingles: Column, numHashes: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(shingles), numHashes))

  def simhash_bits(tokens: Column): Column =
    bridge.column(SimHashBits(bridge.expression(tokens)))

  def simhash_bits_md5(tokens: Column): Column =
    bridge.column(SimHashBitsMd5(bridge.expression(tokens)))
}
