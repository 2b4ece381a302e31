package graft

import graft.singer.SingerWriter
import graft.sources.GsReader
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Singer sink parity with the reference golden `tests/data/output/data.singer`
  * (reference tests/etl_test.py:129-182): read the campaign_performance
  * parquet (pk via file metadata), export, compare message-by-message. */
class SingerWriterSpec extends SparkSpec {
  private val mapper = new ObjectMapper()

  test("campaign_performance export matches golden data.singer") {
    val reader = new GsReader(spark, refData("input"))
    assert(reader.streams().contains("campaign_performance"))
    val df = reader.get("campaign_performance").get
    assert(reader.getPk("campaign_performance") === Seq("id"))

    val out = s"${tmpDir("singer_")}/campaign_performance.singer"
    SingerWriter.write(df, "campaign_performance", out,
      keyProperties = reader.getPk("campaign_performance"))

    val got = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out)).asScala
    val want = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(refData("output/data.singer"))).asScala
    assert(got.size === want.size) // SCHEMA + 8 RECORDs + STATE

    val gotJ = got.map(mapper.readTree)
    val wantJ = want.map(mapper.readTree)
    // SCHEMA: same stream, same key_properties, same property types
    assert(gotJ.head.get("type").asText() === "SCHEMA")
    assert(gotJ.head.get("stream") === wantJ.head.get("stream"))
    assert(gotJ.head.get("key_properties") === wantJ.head.get("key_properties"))
    val gotProps = gotJ.head.at("/schema/properties")
    val wantProps = wantJ.head.at("/schema/properties")
    assert(gotProps === wantProps)
    // RECORDs: identical parsed payloads, same order
    gotJ.tail.init.zip(wantJ.tail.init).foreach { case (g, w) => assert(g === w) }
    // STATE footer
    assert(gotJ.last.get("type").asText() === "STATE")
    assert(gotJ.last.get("value").toString === "{}")
  }

  test("append mode skips the schema header") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    val out = s"${tmpDir("singer_")}/t.singer"
    SingerWriter.write(df, "t", out, emitState = false)
    SingerWriter.write(df, "t", out, emitState = true)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out)).asScala
    val types = lines.map(l => mapper.readTree(l).get("type").asText())
    assert(types.toSeq === Seq("SCHEMA", "RECORD", "RECORD", "STATE"))
  }

  test("null scalars are dropped from records; timestamps serialize ISO-micros-Z") {
    import spark.implicits._
    val df = Seq((1L, Some("x"), Some(java.sql.Timestamp.valueOf("2024-05-23 20:01:07"))),
        (2L, None, None))
      .toDF("id", "s", "ts")
    val lines = df.orderBy("id")
      .select(SingerWriter.recordLine(df, "t")).collect().map(_.getString(0))
    val r1 = mapper.readTree(lines(0)).get("record")
    assert(r1.get("ts").asText() === "2024-05-23T20:01:07.000000Z")
    val r2 = mapper.readTree(lines(1)).get("record")
    assert(!r2.has("s") && !r2.has("ts")) // nulls dropped
    assert(r2.get("id").asLong() === 2L)
  }

  test("distributed singer export writes record parts + schema/state sidecars") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("id", "v").repartition(4)
    val dir = tmpDir("singerd_")
    SingerWriter.writeDistributed(df, "t", dir)
    val records = spark.read.text(s"$dir/records").collect().map(_.getString(0))
    assert(records.length === 100)
    assert(records.forall(l => mapper.readTree(l).get("type").asText() == "RECORD"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_schema.singer")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_state.singer")))
  }

  test("export router writes parquet/csv/json and rejects unknown formats") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    val dir = tmpDir("export_")
    graft.export.Exporter.export(df, "s1", dir, format = "parquet")
    assert(spark.read.parquet(s"$dir/s1").count() === 1)
    graft.export.Exporter.export(df, "s1", dir, format = "csv")
    graft.export.Exporter.export(df, "s1", dir, format = "jsonl")
    intercept[IllegalArgumentException] {
      graft.export.Exporter.export(df, "s1", dir, format = "nope")
    }
  }

  test("output name templating + env override") {
    assert(graft.export.Exporter.outputName("orders", "{TENANT}_",
      Map("TENANT" -> "acme"), env = Map.empty) === "acme_orders")
    assert(graft.export.Exporter.outputName("orders", "{MISSING}_",
      Map.empty, env = Map.empty) === "_orders")
    assert(graft.export.Exporter.outputName("orders", "",
      Map.empty, env = Map("HG_UNIFIED_OUTPUT_ORDERS" -> "renamed")) === "renamed")
  }

  test("record envelope supports version and time_extracted") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    val line = df.select(SingerWriter.recordLine(df, "t",
        version = Some(3L),
        timeExtracted = Some(java.time.Instant.parse("2024-05-23T20:01:07.000123Z"))))
      .first().getString(0)
    val j = mapper.readTree(line)
    assert(j.get("version").asLong() === 3L)
    assert(j.get("time_extracted").asText() === "2024-05-23T20:01:07.000123Z")
  }

  test("fromCaseClass emits a singer schema from a typed model") {
    val node = graft.schema.SingerSchema.fromCaseClass[SingerWriterSpec.Invoice]
    val props = node.get("properties")
    assert(props.get("id").get("type").get(0).asText() === "integer")
    assert(props.get("amount").get("type").get(0).asText() === "number")
    assert(props.get("issued").get("format").asText() === "date-time")
  }

  test("export round-trip matches golden campaign_performance parquet/csv values") {
    val reader = new GsReader(spark, refData("input"))
    val df = reader.get("campaign_performance").get
    val out = tmpDir("export_rt_")
    graft.export.Exporter.export(df, "campaign_performance", out, format = "parquet")
    graft.export.Exporter.export(df, "cp_csv", out, format = "csv")

    def norm(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
      val cols = d.columns.sorted
      d.select(cols.map(c => col(s"`$c`").cast("string")): _*)
        .collect().toSeq.map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) "NULL" else {
            val v = r.getString(i)
            // golden stores float32 values promoted to float64; align both
            // sides to float32 precision before comparing
            try { "%.4f".format(v.toFloat.toDouble) } catch { case _: Exception => v }
          })).sortBy(_.mkString("\u0001"))
    }
    val goldenPq = spark.read.parquet(refData("output/campaign_performance_parquet.parquet"))
    val minePq = spark.read.parquet(s"$out/campaign_performance")
    assert(minePq.columns.sorted.toSeq === goldenPq.columns.sorted.toSeq)
    assert(norm(minePq) === norm(goldenPq))

    val goldenCsv = spark.read.option("header", "true").csv(refData("output/campaign_performance_csv.csv"))
    val mineCsv = spark.read.option("header", "true").csv(s"$out/cp_csv")
    assert(mineCsv.columns.sorted.toSeq === goldenCsv.columns.sorted.toSeq)
    assert(norm(mineCsv) === norm(goldenCsv))
  }
}

object SingerWriterSpec {
  final case class Invoice(id: Long, amount: Double, issued: java.sql.Timestamp)
}
