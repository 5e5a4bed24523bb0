package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JsonFlattenSpec extends SparkSpec {
  import spark.implicits._

  private val envelope =
    """{"data": [
      |  {"id": 911001, "date_time": "14011225093000",
      |   "close_price": 1020.0, "close_price_change": 20.0,
      |   "instrument": {"id": 301, "type": "share"},
      |   "meta": {"version": 500123}},
      |  {"id": 911002, "date_time": "14011226093000",
      |   "close_price": null, "close_price_change": 5.0,
      |   "instrument": {"id": 302, "type": "bond"},
      |   "meta": {"version": 500124}}
      |]}""".stripMargin.replace("\n", " ")

  test("parseEnvelope unwraps data[] and flattens nested objects") {
    val df = JsonFlatten.parseEnvelope(spark, Seq(envelope).toDS())
    assert(df.columns.toSet == Set("id", "date_time", "close_price",
      "close_price_change", "instrument_id", "instrument_type", "meta_version"))
    assert(df.count() == 2)
    val r = df.filter($"id" === 911001).first()
    assert(r.getAs[Long]("instrument_id") == 301L)
    assert(r.getAs[Long]("meta_version") == 500123L)
  }

  test("dotted separator reproduces reference naming") {
    val df = JsonFlatten.parseEnvelope(spark, Seq(envelope).toDS(), sep = ".")
    assert(df.columns.contains("instrument.id"))
    assert(df.select(col("`meta.version`")).first().getLong(0) == 500123L)
  }

  test("deeply nested structs flatten recursively") {
    val js = """{"data":[{"id":1,"stock":{"company":{"id":42,"name":"acme"}}}]}"""
    val df = JsonFlatten.parseEnvelope(spark, Seq(js).toDS())
    assert(df.columns.toSet == Set("id", "stock_company_id", "stock_company_name"))
    assert(df.first().getAs[Long]("stock_company_id") == 42L)
  }

  test("arrays of structs pass through; firstElementField extracts [0].id") {
    val js = """{"data":[{"id":1,"categories":[{"id":7,"n":"a"},{"id":8,"n":"b"}]},
               |{"id":2,"categories":[]}]}""".stripMargin.replace("\n", "")
    val df = JsonFlatten.parseEnvelope(spark, Seq(js).toDS())
    val withCat = df.withColumn("category_id",
      JsonFlatten.firstElementField(col("categories"), "id"))
    val rows = withCat.select("id", "category_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((1L, 7L), (2L, -1L)))
  }

  test("empty data array yields zero rows without failing") {
    val df = JsonFlatten.parseEnvelope(spark, Seq("""{"data":[]}""").toDS())
    assert(df.count() == 0)
  }
}
