package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val mk = SparkEntry.benchQueries("q74_neardup_ingest")
    val times = (1 to 5).map { _ =>
      val thunk = mk(spark, dir)
      val t0 = System.nanoTime()
      Bench.force(thunk())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SMOKE q74 min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
