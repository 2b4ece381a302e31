package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build: map-side partial filters OR-merged up
  * the aggregation tree. Input is a pre-hashed LONG key (`xxhash64` over
  * the pk columns — hashing with a Spark-native expression keeps the
  * build/probe sides trivially consistent); output is the serialized
  * filter (BinaryType).
  *
  * Used per pk-hash bucket (`groupBy(bucket).agg(BloomAggregate(...))`)
  * to build the incremental-dedup sidecars of
  * [[graft.operators.BucketedSnapshotStore]]: each bucket's filter is
  * sized independently, and partial aggregation means every executor
  * inserts its own partition's keys locally — only filter BITMAPS cross
  * the shuffle, never keys.
  *
  * Bit-level determinism: inserting a set of keys sets a set of bits;
  * both insertion order and partitioning only change the ORDER bits are
  * OR-ed in, so the final bitmap — and its serialized bytes — are
  * identical under any partitioning (spec-asserted). `expectedItems` is a
  * SIZING hint: undersizing degrades the false-positive rate, never
  * correctness (no false negatives, by Bloom construction).
  *
  * Reference has no counterpart — the pandas engine re-reads the whole
  * snapshot per run (etl_utils.py:180-191); a 100 TB store needs a
  * membership sketch so re-ingested duplicates never touch the history.
  */
case class BloomAggregate(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter =
    buffer.mergeInPlace(other)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggregate =
    copy(child = newChild)
}

/** Hadoop `Configuration` is not `Serializable`; this is the standard
  * write/readFields envelope so executor-side code can open the bloom
  * sidecar files through whatever filesystem the store lives on. */
class SerializableHadoopConf(@transient private var conf: Configuration)
  extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** bucket → bloom sidecar path, plus the filesystem conf to open them
  * with. Executors load each filter LAZILY on first probe and cache it
  * per JVM ([[BloomBankCache]]) — the driver never ships filter bytes in
  * the plan, so a task closure stays small no matter how large the bank
  * is, and an executor only ever loads the buckets its rows hash into
  * (bounded when the probe side is bucket-partitioned). */
case class BloomBank(files: Map[Int, String], conf: SerializableHadoopConf)

object BloomBankCache {
  /** Per-JVM cache keyed by sidecar path. Generations are immutable once
    * a manifest names them (BucketedSnapshot commit protocol), so a
    * cached filter can never go stale; superseded generations stop being
    * probed, their entries just age harmlessly until the JVM exits. */
  private val cache = TrieMap.empty[String, BloomFilter]
  def get(path: String, conf: Configuration): BloomFilter =
    cache.getOrElseUpdate(path, {
      val p = new Path(path)
      val in = p.getFileSystem(conf).open(p)
      try BloomFilter.readFrom(in) finally in.close()
    })
  private[graft] def clear(): Unit = cache.clear()
}

/** `might_contain` over ONE serialized filter (the join-pruning probe —
  * [[graft.operators.Ops.bloomPrunedJoin]]): the filter bytes ride the
  * expression into each task and deserialize once per JVM via a
  * bytes-keyed cache. For multi-GB banks use [[BloomBankMightContain]]
  * (lazy per-bucket sidecar loads); this single-filter form is for the
  * classic dim-side filter (~1.2 MB per million keys at 1% fpp).
  * CodegenFallback: per-row work is k bit-probes. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter =
    BloomSingleCache.get(filterBytes)

  override protected def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomSingleCache {
  /** Per-JVM deserialized-filter cache keyed by the FULL serialized
    * bytes (content-equal immutable wrapper — the bytes never mutate
    * once built). A 32-bit-hash key would let two same-length filters
    * collide and silently probe the wrong filter, turning might_contain
    * false negatives into dropped rows; full-content keying makes that
    * structurally impossible at the cost of one array compare per
    * cache hit. */
  private val cache =
    TrieMap.empty[scala.collection.immutable.ArraySeq[Byte], BloomFilter]
  def get(bytes: Array[Byte]): BloomFilter =
    cache.getOrElseUpdate(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes),
      BloomFilter.readFrom(new ByteArrayInputStream(bytes)))
  private[graft] def clear(): Unit = cache.clear()
}

object Bloom {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.bridge

  /** Distributed filter build over a pre-hashed long key column. */
  def bloom_agg(hashed: Column, expectedItems: Long, fpp: Double): Column =
    bridge.column(BloomAggregate(bridge.expression(hashed), expectedItems, fpp)
      .toAggregateExpression())

  /** Probe a serialized filter with a pre-hashed long key column. */
  def might_contain(hashed: Column, filterBytes: Array[Byte]): Column =
    bridge.column(BloomMightContain(bridge.expression(hashed), filterBytes))
}

/** `might_contain` over a per-bucket filter bank: looks up the row's
  * bucket in the bank and probes that bucket's filter with the row's
  * pre-hashed key. A bucket ABSENT from the bank has no committed history
  * at all → definitely new → false. No false negatives either way: build
  * and probe hash with the same `xxhash64` expression, and every
  * committed key of a bucket is in that bucket's (merged-generation)
  * filter.
  *
  * CodegenFallback is deliberate (same reasoning as [[MinHashSignature]]):
  * the per-row work is a hash-indexed map lookup plus k bit-probes; a
  * generated-code version would save only the boxing of one long. */
case class BloomBankMightContain(
    hashChild: Expression,
    bucketChild: Expression,
    bank: BloomBank)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = hashChild
  override def right: Expression = bucketChild
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bank_might_contain"

  override protected def nullSafeEval(h: Any, b: Any): Any =
    bank.files.get(b.asInstanceOf[Int]) match {
      case Some(path) =>
        BloomBankCache.get(path, bank.conf.value)
          .mightContainLong(h.asInstanceOf[Long])
      case None => false
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBankMightContain =
    copy(hashChild = newLeft, bucketChild = newRight)
}
