package graft

import graft.api._
import graft.schema.Validation
import org.apache.spark.sql.types._

class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("facade: end-to-end pipeline in reference ergonomics") {
    // read folder → explode → map → snapshot → export, all via the facade
    val dir = tmpDir("api_in_")
    Seq((1, "{'k': 5}"), (2, "{'k': 6}")).toDF("id", "props")
      .write.parquet(s"$dir/orders-20240101T000000.parquet")
    val streams = readParquetFolder(spark, dir)
    assert(streams.keySet === Set("orders"))

    val exploded = streams("orders").explodeJsonToCols("props")
    assert(exploded.columns.toSet === Set("id", "props.k"))

    val mapped = exploded.mapFields("""{"Id": "id", "K": "props.k"}""")
    assert(mapped.columns.toSeq === Seq("Id", "K"))

    val store = new graft.operators.SnapshotStore(spark, tmpDir("api_snap_"))
    val merged = mapped.snapshotRecords(store, "orders", Seq("Id"))
    assert(merged.count() === 2)

    val out = tmpDir("api_out_")
    mapped.toExport("orders", out, format = "singer")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/orders.singer")))
  }

  test("facade: scale ops syntax") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    assert(docs.exactDedup(Seq("text"), "doc_id").count() === 2)
    assert(docs.analyzeText("text").columns.contains("quality"))
    // clustered near-dedup: exact dups collapse, distinct doc survives
    val kept = docs.nearDedupClustered("doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }

  test("validateModel drops uncastable rows and logs; raises when asked") {
    val model = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType, nullable = true)))
    val df = Seq(("1", "9.5"), ("nope", "2.0"), ("3", "xx")).toDF("id", "amount")
    val log = tmpDir("val_") + "/error_log.txt"
    val ok = Validation.validateModel(df, model, raiseError = false, errorLog = log)
    // only ("1", "9.5") survives: "nope" fails the id cast, "xx" the amount cast
    assert(ok.collect().map(_.getLong(0)).toSeq === Seq(1L))
    val logged = java.nio.file.Files.readString(java.nio.file.Paths.get(log))
    assert(logged.contains("failed to be casted"))
    intercept[Validation.ValidationError] {
      Validation.validateModel(df, model, raiseError = true).collect()
    }
  }

  test("loadConfigJson merges file over defaults, keeps defaults for empty") {
    import graft.export.PipelineConfig
    val p = tmpDir("cfg_") + "/config.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      """{"a": "file", "b": "", "extra": "x"}""")
    val merged = PipelineConfig.loadConfigJson(Some(p), Map("a" -> "d1", "b" -> "d2", "c" -> "d3"))
    assert(merged === Map("a" -> "file", "b" -> "d2", "c" -> "d3", "extra" -> "x"))
    assert(PipelineConfig.loadConfigJson(None, Map("x" -> "1")) === Map("x" -> "1"))
  }

  test("readCsvFolder applies per-stream column converters") {
    val dir = tmpDir("conv_")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/Invoice-20240101T000000.csv"),
      "id,Line\n1,\"[{'Amount': 5}]\"\n")
    val streams = readCsvFolder(spark, dir,
      converters = Map("Invoice" -> Map("Line" -> parsePyObjects)))
    val line = streams("Invoice").select("Line").first().getString(0)
    assert(line === """[{"Amount": 5}]""")
    // converted column feeds straight into the explode operator
    val exploded = streams("Invoice").explodeJsonToRows("Line")
    assert(exploded.columns.contains("Line.Amount"))
  }
}
