package graft.catalog

import graft.model._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema/identifier validation rules (reference:
  * generate_queries.py:39-50,376-400 and data_mappers/handlers.py:109-156).
  */
class CatalogSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("bal", DecimalType(12, 2)),
    StructField("flag", BooleanType),
    StructField("ts", TimestampType),
    StructField("user", StructType(Seq(
      StructField("Info", StructType(Seq(
        StructField("Email", StringType)))),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, StringType))))),
    StructField("items", ArrayType(StructType(Seq(
      StructField("sku", StringType)))))))

  test("scalar identifier types on the allow-list resolve") {
    assert(Catalog.resolveIdentifier(schema, "id") == LongType)
    assert(Catalog.resolveIdentifier(schema, "name") == StringType)
    assert(Catalog.resolveIdentifier(schema, "bal") == DecimalType(12, 2))
  }

  test("struct children resolve by dot path, case-insensitively") {
    assert(Catalog.resolveIdentifier(schema, "USER.info.EMAIL") == StringType)
  }

  test("types off the allow-list are rejected") {
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "flag"))
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "ts"))
  }

  test("identifiers may not cross arrays or maps") {
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "items.sku"))
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "user.tags"))
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "user.attrs.k"))
  }

  test("missing columns and non-scalar leaves are rejected") {
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "nope"))
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "user.info.missing"))
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(schema, "user")) // struct leaf
  }

  test("validateMapper checks partition keys and columns") {
    val t = TableDef("t", "/x", DataFormat.Parquet, schema, Seq("dt"))
    Catalog.validateMapper(DataMapper("m", "t", Seq("id"),
      partitionKeys = Seq("dt")), t)
    intercept[IllegalArgumentException](Catalog.validateMapper(
      DataMapper("m", "t", Seq("id"), partitionKeys = Seq("nope")), t))
    intercept[IllegalArgumentException](Catalog.validateMapper(
      DataMapper("m", "t", Nil), t))
  }

  test("SerDe registration rules (data_mappers/handlers.py:122-145): " +
    "unsupported lib, format mismatch, prohibited OpenX options") {
    def json(lib: Option[String], params: Map[String, String] = Map.empty) =
      TableDef("t", "/lake/t", DataFormat.JsonLines, schema,
        serdeLib = lib, serdeParams = params)
    // ADT-only registration (no serde lib declared) is always valid
    Catalog.validateSerde(json(None))
    // both JSON serdes valid; parquet serde valid for parquet
    Catalog.validateSerde(json(Some(Catalog.JsonHiveSerde)))
    Catalog.validateSerde(json(Some(Catalog.JsonOpenxSerde)))
    Catalog.validateSerde(TableDef("t", "/lake/t", DataFormat.Parquet,
      schema, serdeLib = Some(Catalog.ParquetHiveSerde)))
    // unsupported lib
    intercept[IllegalArgumentException](Catalog.validateSerde(
      json(Some("org.apache.hadoop.hive.serde2.OpenCSVSerde"))))
    // lib/format mismatch
    intercept[IllegalArgumentException](Catalog.validateSerde(
      TableDef("t", "/lake/t", DataFormat.Parquet, schema,
        serdeLib = Some(Catalog.JsonOpenxSerde))))
    // prohibited OpenX options
    intercept[IllegalArgumentException](Catalog.validateSerde(json(
      Some(Catalog.JsonOpenxSerde),
      Map("ignore.malformed.json" -> "TRUE"))))
    intercept[IllegalArgumentException](Catalog.validateSerde(json(
      Some(Catalog.JsonOpenxSerde), Map("dots.in.keys" -> "true"))))
    intercept[IllegalArgumentException](Catalog.validateSerde(json(
      Some(Catalog.JsonOpenxSerde), Map("mapping.userid" -> "user_id"))))
    // the same options are fine when FALSE / on the Hive JSON serde
    Catalog.validateSerde(json(Some(Catalog.JsonOpenxSerde),
      Map("ignore.malformed.json" -> "FALSE")))
    Catalog.validateSerde(json(Some(Catalog.JsonHiveSerde),
      Map("mapping.userid" -> "user_id")))
    // and validateMapper routes through the serde check
    intercept[IllegalArgumentException](Catalog.validateMapper(
      DataMapper("m", "t", Seq("id"), format = DataFormat.JsonLines),
      json(Some(Catalog.JsonOpenxSerde), Map("dots.in.keys" -> "TRUE"))))
  }

  test("tableFromDdl: Glue-style type strings register a declared-schema " +
    "table, nested identifiers resolve, bad types fail loudly") {
    import org.apache.spark.sql.types._
    val t = Catalog.tableFromDdl("u", "/lake/u", DataFormat.JsonLines,
      Seq("user_id" -> "bigint", "name" -> "varchar(32)",
        "balance" -> "decimal(10,2)",
        "profile" -> "struct<email: string, age: int>",
        "tags" -> "array<string>"),
      serdeLib = Some(Catalog.JsonHiveSerde))
    assert(t.schema("user_id").dataType == LongType)
    assert(t.schema("balance").dataType == DecimalType(10, 2))
    // nested struct children are identifier-addressable, arrays are not
    assert(Catalog.resolveIdentifier(t.schema, "profile.email") == StringType)
    intercept[IllegalArgumentException](
      Catalog.resolveIdentifier(t.schema, "tags.x"))
    // char/varchar normalize to string: Spark's read path REJECTS
    // schemas containing them ("char/varchar type can only be used in
    // the table schema"), so keeping the parsed type would crash every
    // Find over a varchar-declared Glue table
    assert(t.schema("name").dataType == StringType)
    assert(Catalog.parseDdlType("struct<v: varchar(5), c: char(2)>") ==
      StructType(Seq(StructField("v", StringType),
        StructField("c", StringType))))
    // the DDL path runs the same SerDe validation as every registration
    intercept[IllegalArgumentException](Catalog.tableFromDdl(
      "u2", "/lake/u2", DataFormat.JsonLines, Seq("a" -> "int"),
      serdeLib = Some(Catalog.JsonOpenxSerde),
      serdeParams = Map("dots.in.keys" -> "TRUE")))
    // unparseable type names the offending string
    val e = intercept[IllegalArgumentException](
      Catalog.parseDdlType("notatype<<"))
    assert(e.getMessage.contains("notatype"))
  }

  test("overlapping mapper locations are rejected; disjoint pass") {
    def m(id: String, loc: String) =
      (DataMapper(id, "t", Seq("id")),
        TableDef("t", loc, DataFormat.Parquet, schema))
    Catalog.checkNoOverlap(Seq(m("a", "/lake/t1"), m("b", "/lake/t2")))
    intercept[IllegalArgumentException](Catalog.checkNoOverlap(
      Seq(m("a", "/lake/t1"), m("b", "/lake/t1/sub"))))
    intercept[IllegalArgumentException](Catalog.checkNoOverlap(
      Seq(m("a", "/lake/t1"), m("b", "/lake/t1"))))
  }
}
