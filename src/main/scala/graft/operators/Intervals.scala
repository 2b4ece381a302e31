package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Interval (gaps-and-islands) analytics over [start, end] spans per key —
  * the workhorse behind utilization ("how long was the machine actually
  * busy"), incident overlap, and session-coverage questions. The classic
  * single-node answer is a per-key ORDER BY start + running max(end)
  * sweep; at corpus scale that is a corpus-wide per-group window. Here the
  * sweep runs in the distributed-cumsum idiom (the
  * [[Sampling.selectByTokenBudget]] family): ONE range exchange on
  * (key, start, end), partition-LOCAL running windows, and two
  * driver-sized per-(range, key) offset rounds (prefix max(end), prefix
  * Σ new-island flags) broadcast back — no per-key serialization, no
  * second corpus shuffle. Key cardinality must be domain-like (≤ 100k,
  * the [[Sampling]] convention); higher-cardinality keys should
  * pre-aggregate or accept the plain window.
  *
  * Reference scope note: gluestick has no interval surface; this is part
  * of the warehouse-analytics extension tier (SURVEY §2.8).
  */
object Intervals {

  /** Merge overlapping/touching [start, end] intervals per key into
    * islands. Inputs are integer (long) endpoints — micros, millis, ids —
    * so the merge is exact integer arithmetic end-to-end. An interval
    * opens a new island iff its start is strictly greater than the max
    * end of ALL earlier intervals in (start, end) order (touching spans,
    * start == prev end, merge — coverage of adjacent closed spans).
    * Invalid rows (end < start) are dropped. Returns one row per island:
    * (key, island_start, island_end, n_intervals).
    *
    * Determinism: the new-island flag compares each start against a
    * running MAX — order-insensitive over the tied prefix — and rows tie
    * in the (start, end) sort only when fully identical, so island
    * membership is a pure function of the data under any partitioning
    * (spec-asserted).
    */
  def mergedIslands(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(keyCol).as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .filter(col("__e") >= col("__s"))
    val ranged = base
      .repartitionByRange(p, col("__k").asc, col("__s").asc, col("__e").asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)

    // round 1: per-(range, key) max(end) → prefix max over earlier ranges
    val maxes = ranged.groupBy("__pid", "__k").agg(max("__e").as("__m"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    require(maxes.map(_._2).distinct.size <= 100000,
      s"mergedIslands saw ${maxes.map(_._2).distinct.size} keys — key " +
        "cardinality must be domain-like (<= 100k); pre-aggregate first")
    if (maxes.isEmpty)
      return ranged.select(col("__k").as(keyCol),
        col("__s").as("island_start"), col("__e").as("island_end"),
        lit(0L).as("n_intervals")).limit(0)
    val keyType = ranged.schema("__k").dataType
    def offsetsDf(rows: Seq[(Int, Any, Long)]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 1),
        StructType(Seq(StructField("__opid", IntegerType),
          StructField("__ok", keyType), StructField("__off", LongType))))
    val prefMax = maxes.groupBy(_._2).iterator.flatMap { case (k, cs) =>
      val sorted = cs.sortBy(_._1)
      // prefix max of end over EARLIER pids of this key (Long.MinValue = none)
      sorted.map(_._1).zip(
        sorted.scanLeft(Long.MinValue)((a, c) => math.max(a, c._3)).dropRight(1))
        .map { case (pid, m) => (pid, k, m) }
    }.toSeq
    val localPrev = max(col("__e")).over(
      Window.partitionBy("__pid", "__k").orderBy(col("__s").asc, col("__e").asc)
        .rowsBetween(Window.unboundedPreceding, -1))
    val flagged = ranged
      .join(broadcast(offsetsDf(prefMax)),
        col("__pid") === col("__opid") && col("__k") === col("__ok"), "left")
      .withColumn("__prev",
        greatest(coalesce(localPrev, lit(Long.MinValue)),
          coalesce(col("__off"), lit(Long.MinValue))))
      .withColumn("__f",
        when(col("__prev") === Long.MinValue || col("__s") > col("__prev"), 1L)
          .otherwise(0L))
      .drop("__opid", "__ok", "__off", "__prev")
      .localCheckpoint(false)

    // round 2: per-(range, key) flag counts → prefix island-id offsets
    val fcounts = flagged.groupBy("__pid", "__k").agg(sum("__f").as("__c"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    val prefCnt = fcounts.groupBy(_._2).iterator.flatMap { case (k, cs) =>
      val sorted = cs.sortBy(_._1)
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3).dropRight(1))
        .map { case (pid, off) => (pid, k, off) }
    }.toSeq
    val localIsl = sum(col("__f")).over(
      Window.partitionBy("__pid", "__k").orderBy(col("__s").asc, col("__e").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged
      .join(broadcast(offsetsDf(prefCnt)),
        col("__pid") === col("__opid") && col("__k") === col("__ok"))
      .withColumn("__iid", localIsl + col("__off"))
      .groupBy(col("__k"), col("__iid"))
      .agg(min("__s").as("island_start"), max("__e").as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col("__k").as(keyCol), col("island_start"),
        col("island_end"), col("n_intervals"))
  }

  /** Per-key coverage report over merged islands: how many raw intervals,
    * how many merged busy islands, total covered span, and the longest
    * island — the utilization summary a capacity review reads. Pure
    * integer arithmetic on [[mergedIslands]] output (islands-sized, one
    * key-width aggregate). Returns
    * (key, n_intervals, n_islands, covered, max_island). */
  def coverageReport(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, partitions: Int = 0): DataFrame =
    mergedIslands(df, keyCol, startCol, endCol, partitions)
      .groupBy(col(keyCol))
      .agg(sum("n_intervals").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered"),
        max(col("island_end") - col("island_start")).as("max_island"))
}
