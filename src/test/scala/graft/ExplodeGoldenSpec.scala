package graft

import graft.operators.Explode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-file parity with the reference's explode fixtures
  * (reference tests/etl_test.py:22-126, data under tests/data/). */
class ExplodeGoldenSpec extends SparkSpec {

  private def readCsv(path: String): DataFrame = {
    // escape="\"" → RFC-4180 doubled quotes inside quoted cells
    val df = spark.read.option("header", "true").option("escape", "\"").csv(path)
    // golden files carry a UTF-8 BOM on the first header cell
    df.columns.headOption.filter(_.startsWith("﻿")) match {
      case Some(h) => df.withColumnRenamed(h, h.stripPrefix("﻿"))
      case None    => df
    }
  }

  private def normalized(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(c => col(s"`$c`").cast("string")): _*)
      .collect().toSeq
      .map(r => (0 until r.length).map { i =>
        // pandas serializes missing cells in exploded goldens as "NaN"
        if (r.isNullAt(i) || r.getString(i) == "NaN") "NULL"
        else {
          val s = r.getString(i)
          // canonicalize numeric strings: 90.80 == 90.8, 1 == 1.0
          try BigDecimal(s).underlying().stripTrailingZeros().toPlainString
          catch { case _: NumberFormatException => s }
        }
      })
      .sortBy(_.mkString("\u0001"))
  }

  private def assertMatchesGolden(result: DataFrame, goldenRel: String): Unit = {
    val golden = readCsv(refData(goldenRel))
    assert(result.columns.sorted.toSeq === golden.columns.sorted.toSeq)
    assert(normalized(result) === normalized(golden))
  }

  test("explode_json_to_cols matches golden json_to_cols.csv") {
    val in = readCsv(refData("input/json_to_cols.csv"))
    val out = Explode.explodeJsonToCols(in, "Metadata")
    assertMatchesGolden(out, "output/json_to_cols.csv")
  }

  test("explode_json_to_cols matches golden json_to_cols_unique.csv") {
    val in = readCsv(refData("input/json_to_cols_unique.csv"))
    val out = Explode.explodeJsonToCols(in, "Metadata")
    assertMatchesGolden(out, "output/json_to_cols_unique.csv")
  }

  test("explode_json_to_rows matches golden json_to_rows.csv") {
    val in = readCsv(refData("input/json_to_rows.csv"))
    val out = Explode.explodeJsonToRows(in, "Line Detail")
    assertMatchesGolden(out, "output/json_to_rows.csv")
  }

  test("composed explodes match golden explode_multi.csv in either order") {
    val in = readCsv(refData("input/multi_json.csv"))
    val rowsFirst = Explode.explodeJsonToCols(
      Explode.explodeJsonToRows(in, "LineDetail"), "Metadata")
    val colsFirst = Explode.explodeJsonToRows(
      Explode.explodeJsonToCols(in, "Metadata"), "LineDetail")
    assertMatchesGolden(rowsFirst, "output/explode_multi.csv")
    assertMatchesGolden(colsFirst, "output/explode_multi.csv")
  }

  test("explode_json_to_cols fills expected keys missing from data") {
    import spark.implicits._
    val df = Seq(("a", "{'x': 1}")).toDF("id", "obj")
    val out = Explode.explodeJsonToCols(df, "obj", expectedKeys = Seq("x", "y"))
    assert(out.columns.toSet === Set("id", "obj.x", "obj.y"))
    assert(out.select("`obj.y`").first().isNullAt(0))
  }

  test("explode_json_to_rows wraps non-list cells and keeps null rows") {
    import spark.implicits._
    val df = Seq(
      ("a", "{'Id': '1'}"),        // bare object → 1-element list
      ("b", null.asInstanceOf[String]), // null → row survives (explode_outer)
      ("c", "[{'Id': '2'}, {'Id': '3'}]")).toDF("k", "v")
    val out = Explode.explodeJsonToRows(df, "v")
    assert(out.count() === 4)
    assert(out.filter(col("k") === "b").count() === 1)
  }

  test("jsonTupleToCols extracts key/value from dict or first-of-list") {
    import spark.implicits._
    val df = Seq(
      ("a", "{'Name': 'n1', 'Value': 'v1'}"),
      ("b", "[{'Name': 'n2', 'Value': 'v2'}]"),
      // multi-element list: reference takes x[0] (pandas_utils.py:30-40)
      ("c", "[{'Name': 'n3', 'Value': 'v3'}, {'Name': 'nX', 'Value': 'vX'}]")
    ).toDF("id", "cf")
    val out = Explode.jsonTupleToCols(df, "cf")
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("n1", "n2", "n3"))
    assert(rows.map(_.getString(2)).toSeq === Seq("v1", "v2", "v3"))
    assert(!out.columns.contains("cf"))
  }

  test("compress_rows_to_col inverts explode") {
    import spark.implicits._
    val df = Seq((1, "a", 10.0), (1, "b", 20.0), (2, "c", 30.0))
      .toDF("pk", "line.x", "line.y")
    val out = Explode.compressRowsToCol(df, "line", Seq("pk"))
    val m = out.orderBy("pk").collect()
    assert(m.length === 2)
    val l1 = m(0).getSeq[org.apache.spark.sql.Row](1)
    assert(l1.map(_.getString(0)) === Seq("a", "b"))
  }

  test("arrayToDict reduces [{Name,Value}] arrays to maps") {
    import spark.implicits._
    val df = Seq(1).toDF("id").withColumn("arr",
      expr("array(named_struct('Name','a','Value','1'), named_struct('Name','b','Value','2'))"))
    val m = df.select(Explode.arrayToDict(col("arr")).as("m"))
      .first().getMap[String, String](0)
    assert(m === Map("a" -> "1", "b" -> "2"))
  }

  test("explode_json_to_rows maxLevel=2 flattens nested objects one level deeper") {
    import spark.implicits._
    val df = Seq(("a", "[{'Id': 1, 'Meta': {'x': 'X', 'y': 2}}]")).toDF("k", "v")
    val l1 = Explode.explodeJsonToRows(df, "v", maxLevel = 1)
    assert(l1.schema("v.Meta").dataType.typeName === "struct")
    val l2 = Explode.explodeJsonToRows(df, "v", maxLevel = 2)
    assert(l2.columns.toSet === Set("k", "v.Id", "v.Meta.x", "v.Meta.y"))
    assert(l2.select("`v.Meta.x`").first().getString(0) === "X")
  }

  test("pyRepr escapes non-printable unicode like CPython repr") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // CPython str.isprintable: soft hyphen U+00AD (Cf) and zero-width
    // space U+200B (Cf) escape as \\xad / \\u200b, line separator U+2028
    // (Zl) as \\u2028; printable non-ASCII (incl. astral So like U+1F600)
    // stays verbatim
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq(("a\u00ADb", "z\u200Bw", "p\u2028q", "ok " + emoji))
      .toDF("a", "b", "c", "d")
    val out = df.select(graft.functions.PyStr.pyRepr(
      struct(col("a"), col("b"), col("c"), col("d")))).first().getString(0)
    assert(out ===
      s"{'a': 'a\\xadb', 'b': 'z\\u200bw', 'c': 'p\\u2028q', 'd': 'ok $emoji'}")
  }

  test("pythonStr+sorted falls back to string sort for non-orderable entries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a map-typed prefixed column (e.g. from arrayToDict) is not orderable
    // as a struct sort key — the render-then-sort fallback must still work
    val df = Seq((1L, 2L), (1L, 1L)).toDF("id", "line.n")
      .withColumn("line.m", map(lit("k"), col("`line.n`")))
    val out = Explode.compressRowsToCol(df, "line", Seq("id"),
        sorted = true, pythonStr = true)
      .select("line").first().getSeq[String](0)
    assert(out === Seq("{'n': 1, 'm': {'k': 1}}", "{'n': 2, 'm': {'k': 2}}"))
  }

  test("pythonStr+sorted orders by struct fields, not rendered strings") {
    import spark.implicits._
    // lexicographic string sort would put n=10 before n=2 ('1' < '2');
    // struct-field sort must yield 2, 9, 10
    val df = Seq((1L, 9L), (1L, 10L), (1L, 2L)).toDF("id", "line.n")
    val out = Explode.compressRowsToCol(df, "line", Seq("id"),
        sorted = true, pythonStr = true)
      .select("line").first().getSeq[String](0)
    assert(out === Seq("{'n': 2}", "{'n': 9}", "{'n': 10}"))
  }
}
