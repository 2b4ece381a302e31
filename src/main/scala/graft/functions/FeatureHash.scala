package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document hashed-bigram bucket counts in ONE pass over the token
  * array: sorted (bucket, cnt) pairs, bucket ascending.
  *
  * Value-identical to the relational chain
  * `explode(bigrams) → featureBucket → groupBy(doc, bucket).count` (both
  * hash kinds ride [[KgramHash.hash]], which is bit-compatible with the
  * `xxhash64`/`Dedup.md5Hash60` column expressions), but without
  * materializing a bigram string column through a Generate, without the
  * per-row hash projection, and — decisively — without the corpus-wide
  * (doc, bucket) aggregate exchange: the per-doc sparse feature vector is
  * built inside the scan, so feature-space consumers (importance scoring,
  * classifier training) become pure projections.
  *
  * Bigram semantics match `Importance.bigramsCol`: n−1 contiguous pairs,
  * a pair is skipped if either token is null (concat_ws would collapse it
  * to a lone token), docs with < 2 tokens yield an EMPTY array. */
case class BigramBucketCounts(child: Expression, buckets: Int, hashKind: String)
    extends UnaryExpression with CodegenFallback {

  require(buckets > 0, s"buckets must be positive, got $buckets")

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) empty else nullSafeEval(v)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return empty
    val bs = new Array[Long](m - 1)
    var n = 0
    var i = 0
    while (i < m - 1) {
      val a = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val b = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
      if (a != null && b != null) {
        val h = KgramHash.hash(hashKind, UTF8String.concatWs(space, a, b))
        val p = h % buckets
        bs(n) = if (p < 0) p + buckets else p
        n += 1
      }
      i += 1
    }
    if (n == 0) return empty
    java.util.Arrays.sort(bs, 0, n)
    // run-length encode the sorted buckets
    var distinct = 1
    i = 1
    while (i < n) { if (bs(i) != bs(i - 1)) distinct += 1; i += 1 }
    val out = new Array[Any](distinct)
    var k = 0
    var start = 0
    i = 1
    while (i <= n) {
      if (i == n || bs(i) != bs(start)) {
        out(k) = new GenericInternalRow(Array[Any](bs(start), (i - start).toLong))
        k += 1
        start = i
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): BigramBucketCounts =
    copy(child = c)
  override def prettyName: String = "bigram_bucket_counts"
}

object FeatureHash {
  import org.apache.spark.sql.graft.bridge

  def bigram_bucket_counts(tokens: Column, buckets: Int, hashKind: String): Column =
    bridge.column(BigramBucketCounts(bridge.expression(tokens), buckets, hashKind))
}
