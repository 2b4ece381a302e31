package graft

import graft.operators.{Explode, Snapshot, SnapshotStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head with the reference's explode + snapshot workloads. */
object OpsBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 200000L
    val df = spark.range(n)
      .withColumn("Customer Name", concat(lit("Company "), col("id")))
      .withColumn("Line Detail", concat(
        lit("[{'Id': '1', 'Desc': 'Bolts', 'Amount': "), (col("id") % 50) + 100, lit(".5}, "),
        lit("{'Id': '2', 'Desc': 'Wood', 'Amount': "), col("id") % 90, lit(".25}]")))
      .drop("id").cache()
    df.count()
    var t0 = System.nanoTime()
    val out = Explode.explodeJsonToRows(df, "Line Detail", samplingRatio = 0.05)
    val c = Bench.force(out)
    var dt = (System.nanoTime() - t0) / 1e9
    println(f"GRAFT explode_json_to_rows rows=$n out=$c time=$dt%.2fs rows_per_s=${n / dt}%,.0f")

    val m = 500000L
    val store = new SnapshotStore(spark, java.nio.file.Files.createTempDirectory("ob_").toString)
    val base = spark.range(m).toDF("id").withColumn("v", concat(lit("v"), col("id")))
    val delta = spark.range(m / 2, m + m / 2).toDF("id").withColumn("v", concat(lit("n"), col("id")))
    t0 = System.nanoTime()
    Snapshot.snapshotRecords(store, "t", base, Seq("id"))
    val merged = Snapshot.snapshotRecords(store, "t", delta, Seq("id"))
    val mc = Bench.force(merged)
    dt = (System.nanoTime() - t0) / 1e9
    println(f"GRAFT snapshot_records 2 runs rows=$m+$m merged=$mc time=$dt%.2fs")
    spark.stop()
  }
}
