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

  /** Data-skipping effectiveness report: BEFORE paying for a re-layout,
    * measure how many partitions each candidate layout would let a
    * min-max-pruning reader skip for a set of probe predicates — the
    * number the [[layoutByZorder]] decision is actually made on.
    * Evaluates TWO layouts side by side: `zorder` (the Morton key over
    * `cols`) and `linear` (the natural single-column sort on
    * `cols.head`), each cut into `partitions` equal-population partitions
    * by EXACT global rank (the q140 integer-div bucket — deterministic
    * and engine-replayable where a sampled range exchange is not), with
    * per-partition min/max per layout column standing in for the parquet
    * footer stats the real reader prunes on.
    *
    * `probes` is a (probe_id, col_name, lo, hi) frame — one inclusive
    * long range per row, on one column. A partition is skippable for a
    * probe iff its [min, max] for that column misses [lo, hi] entirely.
    *
    * Scale shape: one pure key projection per layout, the ONE range
    * exchange any global order pays (inside globalRowNumber's
    * distributed-cumsum idiom), a partitions×cols stats aggregate
    * (map-side combined), and a probes×partitions-sized join — the
    * corpus is scanned twice (once per candidate layout), everything
    * downstream is report-sized. Returns
    * (layout, probe_id, col_name, lo, hi, n_partitions, n_skipped,
    * skip_frac). */
  def pruningReport(df: DataFrame, idCol: String, cols: Seq[String],
      partitions: Int, probes: DataFrame, bits: Int = 16): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    def statsFor(layout: String, keyed: DataFrame, keyCol: String): DataFrame = {
      val ranked = Sampling.globalRowNumber(
        keyed.select(col(idCol).as("__id") +: col(keyCol).as("__k") +:
          cols.map(c => col(c).cast("long").as(c)): _*),
        "__rank", col("__k").asc, col("__id").asc)
        .localCheckpoint(false)
      val n = ranked.count()
      require(n > 0, "no rows to lay out")
      val binned = ranked.withColumn("__p",
        expr(s"((__rank - 1L) * ${partitions}L) div ${n}L"))
      val statAggs = cols.flatMap(c =>
        Seq(min(col(c)).as("__mn_" + c), max(col(c)).as("__mx_" + c)))
      val wide = binned.groupBy("__p").agg(statAggs.head, statAggs.tail: _*)
      cols.map(c => wide.select(lit(layout).as("layout"), col("__p"),
          lit(c).as("col_name"), col("__mn_" + c).as("__mn"),
          col("__mx_" + c).as("__mx")))
        .reduce(_ unionAll _)
    }
    val statsZ = statsFor("zorder",
      zorderKey(df, cols, "__zkey", bits), "__zkey")
    val statsL = statsFor("linear",
      df.withColumn("__lin", col(cols.head).cast("long")), "__lin")
    val stats = statsZ.unionAll(statsL).localCheckpoint(true)
    val p = probes.select(col("probe_id"), col("col_name"),
      col("lo").cast("long").as("lo"), col("hi").cast("long").as("hi"))
    stats.join(broadcast(p), Seq("col_name"))
      .groupBy("layout", "probe_id", "col_name", "lo", "hi")
      .agg(count(lit(1)).as("n_partitions"),
        sum(when(col("__mx") < col("lo") || col("__mn") > col("hi"), 1L)
          .otherwise(0L)).as("n_skipped"))
      .withColumn("skip_frac",
        round(col("n_skipped").cast("double") /
          col("n_partitions").cast("double"), 6))
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
