package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JDBC parity layer (S4/K1/K2) exercised against embedded Derby — the
  * relational round-trip the reference does against Postgres. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private lazy val store = JdbcTableStore(spark, url)

  test("replace + read round-trips a table (K1/S4)") {
    val df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "meta_version")
    store.replace("source", "trades", df)
    val back = store.read("source", "trades")
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("id", "name", "meta_version"))
    // replace truncates, not drop-recreate: second replace keeps working
    store.replace("source", "trades", df.filter($"id" === 1))
    assert(store.read("source", "trades").count() == 1)
  }

  test("append adds rows (K2); watermark probe sees the max (A1/S5)") {
    val df = Seq((1L, "a", 10L)).toDF("id", "name", "meta_version")
    store.replace("source", "news", df)
    store.append("source", "news", Seq((2L, "b", 25L)).toDF("id", "name", "meta_version"))
    assert(store.read("source", "news").count() == 2)
    val wms = store.probeWatermarks("source", "meta_version")
    assert(wms("news") == 25L)
    assert(store.tables("source").contains("news"))
  }

  test("incremental upsert through JDBC: append past watermark + keep-last") {
    val v1 = Seq((1L, "k1", 10L), (2L, "k2", 11L)).toDF("id", "k", "v")
    store.replace("prod", "ev", v1)
    val batch = Seq((1L, "k1", 9L), (3L, "k1", 15L)).toDF("id", "k", "v")
    val repaired = store.incrementalUpsert("prod", "ev", batch, "v",
      keys = Seq("k"), ordering = Seq(col("v")))
    val kept = repaired.select("k", "v").as[(String, Long)].collect().toMap
    assert(kept == Map("k1" -> 15L, "k2" -> 11L)) // v=9 filtered (≤ wm 11)
  }
}
