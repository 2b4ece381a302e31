package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** All candidate pairs (id_a < id_b) from one LSH bucket's member-id array,
  * with the hot-bucket cap applied IN-EXPRESSION.
  *
  * Replaces the previous relational formulation of candidate generation —
  * `capBuckets` (a bucket-count aggregate plus a count join back over every
  * band row) followed by an a×b self-join on (bucket, sub-bucket) — with a
  * single `groupBy(bucket).agg(collect_list(id))` and this projection:
  * one exchange instead of four, and the ~95% of buckets that are
  * singletons are dropped by a `size ≥ 2` filter before any work.
  *
  * Cap semantics are bit-identical to `capBuckets` (spec-asserted): a
  * bucket with m > maxBucketSize members splits into k = ⌈m/cap⌉
  * sub-buckets by `pmod(xxhash64(id), k)` — the same seed-42 hash the SQL
  * `xxhash64` computes — and only within-sub-bucket pairs emit; cross-sub
  * pairs are dropped (bounded recall loss on degenerate clusters; exact
  * replicas are removed by exactDedup first, per the family contract).
  *
  * Memory: the aggregation buffer holds one bucket's member ids — 8 bytes
  * per member. The relational form never materializes a bucket, so it
  * tolerates arbitrarily degenerate buckets; this form bounds at
  * ~8 B × max-bucket-membership per aggregation buffer (1M near-identical
  * docs surviving exact dedup → 8 MB — pathological corpora only; the
  * emitted pair count is capped identically in both forms).
  *
  * CodegenFallback is deliberate (same reasoning as [[MinHashSignature]]):
  * one boxed call per BUCKET does the entire fused loop. */
case class BucketPairs(child: Expression, maxBucketSize: Int)
    extends UnaryExpression with CodegenFallback {

  private val pairType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(pairType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](m)
    var i = 0
    while (i < m) { ids(i) = arr.getLong(i); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (m <= maxBucketSize) emitPairs(ids, out)
    else {
      // same sub-bucket assignment as capBuckets: pmod(xxhash64(id), k)
      val k = math.ceil(m.toDouble / maxBucketSize).toLong
      val groups = ids.groupBy(id => {
        val h = XXH64.hashLong(id, 42L)
        ((h % k) + k) % k
      })
      groups.valuesIterator.foreach(g => if (g.length >= 2) emitPairs(g, out))
    }
    new GenericArrayData(out.toArray)
  }

  private def emitPairs(ids: Array[Long], out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val n = ids.length
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = ids(i); val b = ids(j)
        if (a != b) // duplicate ids in one bucket produce no self-pair
          out += InternalRow(math.min(a, b), math.max(a, b))
        j += 1
      }
      i += 1
    }
  }

  override protected def withNewChildInternal(c: Expression): BucketPairs =
    copy(child = c)
  override def prettyName: String = "bucket_pairs"
}

/** [[BucketPairs]] for the hamming family: members are (id, 64-bit
  * signature) structs, and the pair's hamming distance is computed — and
  * filtered against `maxDist` — in-expression, so pairs that can't pass
  * the distance test never materialize as rows at all (on chunk-blocked
  * LSH most shared-chunk pairs fail it). Cap semantics identical to
  * [[BucketPairs]]. */
case class HammingBucketPairs(child: Expression, maxBucketSize: Int, maxDist: Int)
    extends UnaryExpression with CodegenFallback {

  private val pairType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))
  override def dataType: DataType = ArrayType(pairType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](m)
    val sigs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0); sigs(i) = s.getLong(1)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (m <= maxBucketSize) emitPairs(ids, sigs, Array.range(0, m), out)
    else {
      // group member indices by sub-bucket so the quadratic emit runs
      // per sub-bucket (O(m·cap) total), never across the whole bucket
      val k = math.ceil(m.toDouble / maxBucketSize).toLong
      val bySub = scala.collection.mutable.LongMap.empty[scala.collection.mutable.ArrayBuffer[Int]]
      i = 0
      while (i < m) {
        val h = XXH64.hashLong(ids(i), 42L)
        bySub.getOrElseUpdate(((h % k) + k) % k,
          new scala.collection.mutable.ArrayBuffer[Int]()) += i
        i += 1
      }
      bySub.valuesIterator.foreach(g => if (g.length >= 2) emitPairs(ids, sigs, g.toArray, out))
    }
    new GenericArrayData(out.toArray)
  }

  private def emitPairs(ids: Array[Long], sigs: Array[Long], idx: Array[Int],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val n = idx.length
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = idx(i); val b = idx(j)
        if (ids(a) != ids(b)) {
          val d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
          if (d <= maxDist)
            out += InternalRow(math.min(ids(a), ids(b)), math.max(ids(a), ids(b)), d)
        }
        j += 1
      }
      i += 1
    }
  }

  override protected def withNewChildInternal(c: Expression): HammingBucketPairs =
    copy(child = c)
  override def prettyName: String = "hamming_bucket_pairs"
}

object BucketPairs {
  import org.apache.spark.sql.graft.bridge

  def bucket_pairs(members: Column, maxBucketSize: Int): Column =
    bridge.column(BucketPairs(bridge.expression(members), maxBucketSize))

  def hamming_bucket_pairs(members: Column, maxBucketSize: Int, maxDist: Int): Column =
    bridge.column(HammingBucketPairs(bridge.expression(members), maxBucketSize, maxDist))
}
