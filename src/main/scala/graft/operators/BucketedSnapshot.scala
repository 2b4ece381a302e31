package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partitioned snapshot store: merge-on-write that only touches the
  * pk-hash buckets the delta lands in.
  *
  * The reference rewrites the whole snapshot file per run
  * (etl_utils.py:180-191) — fine at 50k rows, impossible at 100 TB. Here
  * the snapshot is a parquet dataset hash-partitioned on
  * `pmod(hash(pk), numBuckets)`:
  *
  *  - upsert reads ONLY the buckets present in the incoming batch
  *    (partition pruning on the bucket column — untouched buckets are
  *    never scanned, never rewritten);
  *  - the merge itself is the same window keep-last as `Snapshot.upsert`;
  *  - the write replaces only those bucket directories (dynamic partition
  *    overwrite), so write volume scales with delta size, not snapshot
  *    size.
  *
  * With numBuckets sized so a bucket fits an executor (e.g. 65536 buckets
  * for a 100 TB snapshot → ~1.6 GB/bucket), a 0.1% delta touches ~0.1% of
  * the data.
  */
class BucketedSnapshotStore(
    spark: SparkSession,
    dir: String,
    numBuckets: Int = 64) {

  private val BucketCol = "__gs_bucket"

  def path(name: String): Path = new Path(dir, s"$name.snapshot.bucketed")
  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(name: String): Boolean = fs.exists(path(name))

  private def bucketOf(pk: Seq[String]) =
    pmod(hash(pk.map(col): _*), lit(numBuckets))

  /** Full snapshot (all buckets), bucket column dropped. */
  def read(name: String): Option[DataFrame] =
    if (!exists(name)) None
    else Some(spark.read.parquet(path(name).toString).drop(BucketCol))

  /** Initialize / replace the whole snapshot. */
  def write(name: String, df: DataFrame, pk: Seq[String]): Unit =
    df.withColumn(BucketCol, bucketOf(pk))
      .repartition(col(BucketCol))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy(BucketCol)
      .parquet(path(name).toString)

  /** Merge-by-pk upsert touching only the delta's buckets. Returns the
    * count of rewritten buckets (for observability). */
  def upsert(name: String, incoming: DataFrame, pk: Seq[String]): Long = {
    if (!exists(name)) { write(name, Snapshot.dedupKeepLast(incoming, pk), pk); return numBuckets.toLong }
    val bucketed = incoming.withColumn(BucketCol, bucketOf(pk))
    val touched = bucketed.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return 0L
    // partition pruning: only the touched bucket directories are scanned
    val existing = spark.read.parquet(path(name).toString)
      .filter(col(BucketCol).isin(touched.map(Integer.valueOf).toIndexedSeq: _*))
    val arrival = monotonically_increasing_id()
    val merged = existing.withColumn("__src", lit(0)).withColumn("__arr", lit(0L))
      .unionByName(
        bucketed.withColumn("__src", lit(1)).withColumn("__arr", arrival),
        allowMissingColumns = true)
    val w = Window.partitionBy((pk :+ BucketCol).map(col): _*)
      .orderBy(col("__src").desc, col("__arr").desc)
    val winner = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__src", "__arr", "__rn")
    // dynamic partition overwrite: replaces only the touched buckets
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      winner.repartition(col(BucketCol))
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy(BucketCol)
        .parquet(path(name).toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    touched.length.toLong
  }

  /** Point lookup / key-subset read with bucket pruning: scans only the
    * buckets the requested keys hash into (merge-on-read companion). */
  def readForKeys(name: String, keys: DataFrame, pk: Seq[String]): DataFrame = {
    val touched = keys.select(pmod(hash(pk.map(col): _*), lit(numBuckets)).as(BucketCol))
      .distinct().collect().map(_.getInt(0))
    spark.read.parquet(path(name).toString)
      .filter(col(BucketCol).isin(touched.map(Integer.valueOf).toIndexedSeq: _*))
      .drop(BucketCol)
      .join(keys.select(pk.map(col): _*).distinct(), pk, "left_semi")
  }
}
