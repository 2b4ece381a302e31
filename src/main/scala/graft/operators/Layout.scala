package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) keys and the
  * re-layout that uses them.
  *
  * At 100 TB, scan cost is decided by what the reader can SKIP. Parquet
  * keeps per-file/rowgroup min-max stats; a table sorted by one column
  * prunes on that column only. Sorting by an interleaved-bit (Morton)
  * key keeps rows close in EVERY participating dimension, so min-max
  * stats prune multi-predicate scans (`l_partkey = … AND l_suppkey = …`)
  * without a second copy of the data — the idea behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`.
  *
  * Shape: one stats aggregate (min/max per column, broadcast as a
  * single-row frame), then the key is a PURE integer projection — no
  * shuffle; the optional [[layoutByZorder]] adds exactly one range
  * exchange + in-partition sort (the write-side re-layout). All
  * arithmetic is integer (exact in any engine): bucket =
  * ((v − min) · 2^bits) div (max − min + 1), then bits interleave
  * column-round-robin (column 0 owns bit positions ≡ 0 mod n).
  */
object Layout {

  /** Add a Morton key column `outCol` interleaving `cols` (integral
    * columns; 2-4 of them) at `bits` bits each. Contract:
    * (max−min+1)·2^bits must fit a signed long — at the default 16 bits
    * that allows value ranges up to 2^47, far beyond any key domain this
    * targets; pre-bucket wider domains first. */
  def zorderKey(df: DataFrame, cols: Seq[String], outCol: String = "zkey",
      bits: Int = 16): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4,
      s"zorderKey interleaves 2-4 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * cols must fit a signed long, got $bits * ${cols.size}")
    val n = cols.size
    val nb = 1L << bits
    val statAggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("long")).as(s"__mn$i"),
        max(col(c).cast("long")).as(s"__mx$i"))
    }
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    // bucket each column to [0, 2^bits) — integer div (exact; `div`, not
    // double `/`, which mis-floors near quotient boundaries)
    val bucketed = cols.zipWithIndex.foldLeft(withStats) { case (d, (c, i)) =>
      d.withColumn(s"__zb$i",
        expr(s"((CAST(`$c` AS BIGINT) - __mn$i) * ${nb}L) div " +
          s"(__mx$i - __mn$i + 1L)"))
    }
    // interleave: column i owns bit positions n*b + i
    val zero: Column = lit(0L)
    val z = (0 until bits).foldLeft(zero) { (acc, b) =>
      (0 until n).foldLeft(acc) { (acc2, i) =>
        acc2.bitwiseOR(shiftleft(
          shiftright(col(s"__zb$i"), b).bitwiseAND(lit(1L)), n * b + i))
      }
    }
    bucketed.withColumn(outCol, z)
      .drop((0 until n).flatMap(i => Seq(s"__mn$i", s"__mx$i", s"__zb$i")): _*)
  }

  /** Re-layout `df` for multi-dimensional skipping: range-partition by
    * the Morton key (so each output file owns a compact z-range → tight
    * per-file min-max stats on EVERY interleaved column) and sort within
    * partitions. The write-side companion of [[zorderKey]]. */
  def layoutByZorder(df: DataFrame, cols: Seq[String], partitions: Int,
      bits: Int = 16): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val keyed = zorderKey(df, cols, "__zkey", bits)
    keyed.repartitionByRange(partitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Small-files compaction plan: pack files (ordered by `fileCol`, so
    * existing clustering is preserved) into output bins of
    * ~`targetBytes` each — the planning step of the OPTIMIZE/compaction
    * job every 100 TB table needs continuously. A file's bin is
    * `exclusive-prefix-sum(bytes) div target`, a pure function of the
    * data (stable across runs, engines, partitionings) computed with
    * the [[Sampling.assignTokenShards]] distributed-cumsum idiom — one
    * range exchange, never a one-task global window. A file larger than
    * `targetBytes` gets a bin of its own plus whatever straddle the
    * cumsum assigns — bins are a PLAN (merge these inputs into one
    * output), so oversized inputs simply pass through. Returns one row
    * per bin: (bin, n_files, total_bytes, first_file, last_file). */
  def compactionPlan(df: DataFrame, fileCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0L, s"targetBytes must be > 0, got $targetBytes")
    Sampling.assignTokenShards(
        df.select(col(fileCol), col(bytesCol)), fileCol, bytesCol,
        targetTokens = targetBytes)
      .groupBy(col("shard_id").as("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
  }
}
