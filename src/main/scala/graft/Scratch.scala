package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Graph
import scala.collection.mutable.ArrayBuffer

// Throwaway phase profiler for the graph tier. NOT part of the library.
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PFIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("ADVISORY", "67108864"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("MAXPART", "134217728"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("OPENCOST", "4194304"))
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", sys.env.getOrElse("CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer[(Int, String, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages += ((si.stageId, si.name.split("\n")(0).take(60), wall,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.executorDeserializeTime, si.numTasks))
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def T(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    for (rep <- 1 to 2) {
      println(s"== rep $rep ==")
      val el = T("orders").join(T("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b"))
      val seeds = T("customer").filter(col("c_nationkey") === 0)
        .select(concat(lit("c"), col("c_custkey")).as("n"))
      stages.clear()
      val ci = sys.env.getOrElse("CKPT", "8").toInt
      t("ppr rounds=3 total") {
        force(Graph.personalizedPageRank(Graph.bidirect(el, "a", "b"),
            "src", "dst", seeds, "n", rounds = 3, damping = 0.85,
            checkpointInterval = ci)
          .select(col("node"), round(col("rank"), 9).as("rank"))
          .orderBy("node"))
      }
      if (rep == 2) {
        println("-- stages (wall ms, runTime ms, deser ms, tasks, name)")
        stages.sortBy(-_._3).take(25).foreach { case (id, n, w, rt, gc, nt) =>
          println(f"  s$id%-5d wall=$w%6d run=$rt%6d gc=$gc%6d $nt%3d  $n")
        }
        println(f"  TOTAL stages=${stages.size} wallSum=${stages.map(_._3).sum}%d gcSum=${stages.map(_._5).sum}%d")
      }
      stages.clear()
      t("harmonic2 q154 total") {
        force(Graph.harmonicCentrality2(graft.operators.Analytics.coOccurrenceEdges(
              T("lineitem"), "l_orderkey", "l_partkey"),
            "item_a", "item_b", topK = 20, maxMiddleDegree = 100)
          .select(col("rank"), col("node"), col("degree"), col("n2"),
            round(col("harmonic"), 6).as("harmonic"))
          .orderBy("rank"))
      }
      if (rep == 2) {
        println("-- stages (wall ms, runTime ms, deser ms, tasks, name)")
        stages.sortBy(-_._3).take(25).foreach { case (id, n, w, rt, gc, nt) =>
          println(f"  s$id%-5d wall=$w%6d run=$rt%6d gc=$gc%6d $nt%3d  $n")
        }
        println(f"  TOTAL stages=${stages.size} wallSum=${stages.map(_._3).sum}%d gcSum=${stages.map(_._5).sum}%d")
      }
    }
    spark.stop()
  }
}
