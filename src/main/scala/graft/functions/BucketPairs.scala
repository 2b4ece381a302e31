package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All candidate pairs (id_a < id_b) from one LSH bucket's member-id array,
  * with the hot-bucket cap applied in-expression — as a STREAMING
  * [[Generator]] (explode-style), never a materialized pair array.
  *
  * Replaces the previous relational formulation of candidate generation —
  * `capBuckets` (a bucket-count aggregate plus a count join back over every
  * band row) followed by an a×b self-join on (bucket, sub-bucket) — with a
  * single `groupBy(bucket).agg(collect_list(id))` and this generator:
  * one exchange instead of four, and the ~95% of buckets that are
  * singletons are dropped by a `size ≥ 2` filter before any work.
  *
  * Streaming matters: a dense bucket of m members yields ~m²/2 pairs —
  * an array-valued expression would materialize them all per input row
  * (hundreds of MB for a 4k-member SemDeDup cluster — found the hard way
  * by the 20× stress run) while a generator emits them row-by-row
  * through GenerateExec with O(m) state, exactly like the old join but
  * without its exchanges.
  *
  * Cap semantics are bit-identical to `capBuckets` (spec-asserted): a
  * bucket with m > maxBucketSize members splits into k = ⌈m/cap⌉
  * sub-buckets by `pmod(xxhash64(id), k)` — the same seed-42 hash the SQL
  * `xxhash64` computes — and only within-sub-bucket pairs emit; cross-sub
  * pairs are dropped (bounded recall loss on degenerate clusters; exact
  * replicas are removed by exactDedup first, per the family contract).
  *
  * Memory: one bucket's member ids (8 B each) during iteration — the
  * pair stream itself is O(1).
  *
  * CodegenFallback is deliberate (same reasoning as [[MinHashSignature]]):
  * GenerateExec drives the iterator; one boxed eval per BUCKET. */
case class BucketPairs(child: Expression, maxBucketSize: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return Iterator.empty
    val ids = new Array[Long](m)
    var i = 0
    while (i < m) { ids(i) = arr.getLong(i); i += 1 }
    BucketPairs.groups(ids, maxBucketSize).flatMap(g =>
      BucketPairs.pairIter(g).map { case (a, b) => InternalRow(a, b) })
  }

  override protected def withNewChildInternal(c: Expression): BucketPairs =
    copy(child = c)
  override def prettyName: String = "bucket_pairs"
}

/** [[BucketPairs]] for the hamming family: members are (id, 64-bit
  * signature) structs, and the pair's hamming distance is computed — and
  * filtered against `maxDist` — in-generator, so pairs that fail the
  * distance test never become rows at all (on chunk-blocked LSH most
  * shared-chunk pairs fail it). Cap semantics identical to
  * [[BucketPairs]]; streaming for the same dense-bucket reason. */
case class HammingBucketPairs(child: Expression, maxBucketSize: Int, maxDist: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return Iterator.empty
    val ids = new Array[Long](m)
    val sigs = new scala.collection.mutable.HashMap[Long, Long]()
    var i = 0
    while (i < m) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      // duplicate ids in one bucket keep their first sig (cannot occur on
      // the band/chunk frames — one row per doc per bucket key)
      if (!sigs.contains(ids(i))) sigs.update(ids(i), s.getLong(1))
      i += 1
    }
    BucketPairs.groups(ids, maxBucketSize).flatMap(g =>
      BucketPairs.pairIter(g).flatMap { case (a, b) =>
        val d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
        if (d <= maxDist) Iterator.single(InternalRow(a, b, d))
        else Iterator.empty
      })
  }

  override protected def withNewChildInternal(c: Expression): HammingBucketPairs =
    copy(child = c)
  override def prettyName: String = "hamming_bucket_pairs"
}

object BucketPairs {
  import org.apache.spark.sql.graft.bridge

  /** Sub-bucket grouping shared by both generators: one group (the whole
    * bucket) when m ≤ cap, else ⌈m/cap⌉ groups by pmod(xxhash64(id), k). */
  private[functions] def groups(ids: Array[Long], cap: Int): Iterator[Array[Long]] = {
    val m = ids.length
    if (m <= cap) Iterator.single(ids)
    else {
      val k = math.ceil(m.toDouble / cap).toLong
      val bySub = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      var i = 0
      while (i < m) {
        val h = XXH64.hashLong(ids(i), 42L)
        bySub.getOrElseUpdate(((h % k) + k) % k,
          new scala.collection.mutable.ArrayBuffer[Long]()) += ids(i)
        i += 1
      }
      bySub.valuesIterator.filter(_.length >= 2).map(_.toArray)
    }
  }

  /** Lazy (min, max) id pairs over one group, self-pairs skipped. */
  private[functions] def pairIter(ids: Array[Long]): Iterator[(Long, Long)] =
    for {
      i <- Iterator.range(0, ids.length)
      j <- Iterator.range(i + 1, ids.length)
      if ids(i) != ids(j)
    } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))

  def bucket_pairs(members: Column, maxBucketSize: Int): Column =
    bridge.column(BucketPairs(bridge.expression(members), maxBucketSize))

  def hamming_bucket_pairs(members: Column, maxBucketSize: Int, maxDist: Int): Column =
    bridge.column(HammingBucketPairs(bridge.expression(members), maxBucketSize, maxDist))
}
