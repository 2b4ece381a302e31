package graft

import graft.operators.{Mapping, Ops}
import org.apache.spark.sql.functions._

class MappingSpec extends SparkSpec {
  import spark.implicits._

  val people = Seq((1, "Alice", 30, "HR"), (2, "Bob", 25, "IT"), (3, "Charlie", 35, "HR"))
  def peopleDf = people.toDF("id", "name", "age", "dept")

  test("simple copies and nested objects") {
    val df = Seq((1, "a@x.com", "Anna")).toDF("id", "email", "first")
    val out = Mapping.mapFields(df,
      """{"Id": "id", "Contact": {"Email": "email", "Name": "first"}}""")
    val r = out.first()
    assert(out.columns.toSeq === Seq("Id", "Contact"))
    assert(r.getStruct(1).getString(0) === "a@x.com")
  }

  test("list-of-mappings → array of structs") {
    val df = Seq((1, "p1", "s1")).toDF("id", "primary", "secondary")
    val out = Mapping.mapFields(df,
      """{"Phones": [{"number": "primary"}, {"number": "secondary"}]}""")
    val arr = out.first().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getString(0)) === Seq("p1", "s1"))
  }

  test("missing source columns are skipped, like the reference") {
    val df = Seq((1, "x")).toDF("id", "a")
    val out = Mapping.mapFields(df, """{"A": "a", "B": "does_not_exist"}""")
    assert(out.columns.toSeq === Seq("A"))
  }

  test("pick: lookup join into other_data (scalar target)") {
    val orders = Seq((100, 1), (101, 3), (102, 9)).toDF("okey", "emp_id")
    val out = Mapping.mapFields(orders,
      """{"OrderId": "okey", "EmployeeName": {"pick": {"objects": "employees",
        |"id_field": "id", "filter_ids": "rec.emp_id", "target_fields": "name"}}}""".stripMargin,
      Map("employees" -> peopleDf))
    val rows = out.orderBy("OrderId").collect()
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ===
      Seq("Alice", "Charlie", null))
  }

  test("pick: multiple target fields → struct") {
    val orders = Seq((100, 1)).toDF("okey", "emp_id")
    val out = Mapping.mapFields(orders,
      """{"Employee": {"pick": {"objects": "employees", "id_field": "id",
        |"filter_ids": "rec.emp_id", "target_fields": ["name", "age"]}}}""".stripMargin,
      Map("employees" -> peopleDf))
    val s = out.first().getStruct(0)
    assert(s.getString(0) === "Alice" && s.getInt(1) === 30)
  }

  test("pick with is_list aggregates all matches") {
    val lines = Seq((1, "HR")).toDF("okey", "dept_key")
    val out = Mapping.mapFields(lines,
      """{"Members": {"pick": {"objects": "employees", "id_field": "dept",
        |"filter_ids": "rec.dept_key", "target_fields": "name", "is_list": true}}}""".stripMargin,
      Map("employees" -> peopleDf))
    val names = out.first().getSeq[String](0).sorted
    assert(names === Seq("Alice", "Charlie"))
  }

  test("pickregex projects matching columns; return_as_cf reshapes") {
    val df = Seq((1, "v1", "v2", "other")).toDF("id", "cf_a", "cf_b", "x")
    val out = Mapping.mapFields(df,
      """{"CF": {"pickregex": {"regex_field": "^cf_", "return_as_cf": true}}}""")
    val arr = out.first().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(r => (r.getString(0), r.getString(1))) === Seq(("cf_a", "v1"), ("cf_b", "v2")))
  }

  test("map_fields_df keeps source columns; project=true keeps only mapped") {
    val df = Seq((1, "a")).toDF("id", "v")
    assert(Mapping.mapFieldsDf(df, """{"out": "v"}""").columns.toSet === Set("id", "v", "out"))
    assert(Mapping.mapFields(df, """{"out": "v"}""").columns.toSeq === Seq("out"))
  }

  test("tenant mapping: v1 connectorList format") {
    val cfg =
      """{"hotglue_mapping": {"mapping": {"version": "1.0", "formatOrigin": "connectorList",
        |"salesforce": [{"source": "customers", "target": "Contact", "fields": {"a": "b"}}]}}}""".stripMargin
    val (fields, names) = Mapping.readTenantCustomMapping(cfg, Some("salesforce"))
    assert(names === Map("customers" -> "Contact"))
    assert(fields("customers").get("a").asText() === "b")
  }

  test("tenant mapping: legacy SourceStream/TargetStream format") {
    val cfg =
      """{"hotglue_mapping": {"mapping": {"flow1": {
        |"orders/Order": {"x": "y"}, "users/Contact": {"p": "q"}}}}}""".stripMargin
    val (fields, names) = Mapping.readTenantCustomMapping(cfg, None)
    assert(names === Map("orders" -> "Order", "users" -> "Contact"))
    assert(fields("orders").get("x").asText() === "y")
  }

  test("should_map_table honors selected_tables") {
    val cfg = """{"selected_tables": {"orders": true, "skipme": false}}"""
    assert(Mapping.shouldMapTable("orders", cfg))
    assert(!Mapping.shouldMapTable("skipme", cfg))
    assert(!Mapping.shouldMapTable("absent", cfg))
  }

  test("pluck_fields filters by id set with optional partition key") {
    val out = Ops.pluckFields(peopleDf, "id", Seq(1, 3), Seq("name", "age"),
      partitionKey = Some(("dept", "HR")))
    assert(out.collect().map(_.getString(0)).sorted.toSeq === Seq("Alice", "Charlie"))
  }

  test("processCustomFields drops null values") {
    val df = Seq(("x", null.asInstanceOf[String], "z")).toDF("a", "b", "c")
    val arr = Ops.processCustomFields(df, Seq("a", "b", "c"))
      .select("custom_fields").first().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getString(0)) === Seq("a", "c"))
  }

  test("pick nested inside a sub-object resolves (reference recurses)") {
    val orders = Seq((100, 1)).toDF("okey", "emp_id")
    val out = Mapping.mapFields(orders,
      """{"Vendor": {"Ref": {"pick": {"objects": "employees", "id_field": "id",
        |"filter_ids": "rec.emp_id", "target_fields": "name"}}, "Kind": "okey"}}""".stripMargin,
      Map("employees" -> peopleDf))
    val v = out.first().getStruct(0)
    assert(v.getString(v.fieldIndex("Ref")) === "Alice")
  }

  test("broadcastIfSmall gates the hint on the size estimate") {
    val df = spark.range(1000).toDF("id")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L * 1024 * 1024).toString)
      assert(Ops.broadcastIfSmall(df).queryExecution.logical.toString.contains("Hint"))
      // oversized estimate (range stats = 8 B x 1000 rows > 16 B) -> unhinted
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16")
      assert(!Ops.broadcastIfSmall(df).queryExecution.logical.toString.contains("Hint"))
      // threshold <= 0 disables broadcasting entirely -> never hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!Ops.broadcastIfSmall(df).queryExecution.logical.toString.contains("Hint"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("oversized pick lookup plans without a broadcast hint, result unchanged") {
    val orders = Seq((100, 1), (101, 3), (102, 9)).toDF("okey", "emp_id")
    val mapping =
      """{"OrderId": "okey", "EmployeeName": {"pick": {"objects": "employees",
        |"id_field": "id", "filter_ids": "rec.emp_id", "target_fields": "name"}}}""".stripMargin
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16")
      val out = Mapping.mapFields(orders, mapping, Map("employees" -> peopleDf))
      assert(!out.queryExecution.logical.toString.contains("Hint"))
      val rows = out.orderBy("OrderId").collect()
      assert(rows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ===
        Seq("Alice", "Charlie", null))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
