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

  // ------------------------------------------------------ dialect matrix
  //
  // The reference's real store is Postgres 13 (docker-compose.yaml:78-79);
  // no Postgres server or driver exists in this sandbox, so the Postgres
  // leg pins the DIALECT Spark itself would use against one: the exact
  // DDL types and truncate statement PostgresDialect generates for every
  // column type the pipeline writes. Derby stays the live round-trip leg.
  // If Spark's dialect ever changed a mapping (the to_sql(replace)-drift
  // class of bug), this fails loudly.

  private val postgres =
    org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://host/db")

  test("Postgres dialect maps every pipeline column type to the expected DDL") {
    import org.apache.spark.sql.types._
    // exactly the writer's resolution order: dialect override first,
    // then the common JDBC mapping (JdbcUtils.getJdbcType)
    def ddl(dt: DataType): String =
      postgres.getJDBCType(dt)
        .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(dt))
        .map(_.databaseTypeDefinition)
        .getOrElse(fail(s"no Postgres mapping for $dt"))
    // the reference's column universe (mabna tables: ids, versions,
    // prices, names, json payloads, flags, dates/times)
    assert(ddl(LongType) == "BIGINT")
    assert(ddl(IntegerType) == "INTEGER")
    assert(ddl(DoubleType) == "FLOAT8")          // double precision
    assert(ddl(FloatType) == "FLOAT4")
    assert(ddl(StringType) == "TEXT")            // pandas to_sql parity
    assert(ddl(BooleanType) == "BOOLEAN")
    assert(ddl(BinaryType) == "BYTEA")
    // Spark's TimestampType is instant-semantics (session-TZ) — the
    // timestamptz column is the faithful Postgres shape; the reference's
    // pandas to_sql writes naive TIMESTAMP, which is the NTZ mapping
    assert(ddl(TimestampType) == "TIMESTAMP WITH TIME ZONE")
    assert(ddl(TimestampNTZType) == "TIMESTAMP")
    assert(ddl(DateType) == "DATE")
    assert(ddl(DecimalType(38, 18)) == "NUMERIC(38,18)") // exact money
  }

  test("Postgres truncate is TRUNCATE ONLY and safe for Spark's truncate path") {
    // replace() sets truncate=true: Spark only honors it when the
    // dialect declares truncation non-cascading — otherwise it silently
    // falls back to drop+recreate and the DDL-preservation contract of
    // JdbcTableStore.replace is void
    assert(postgres.isCascadingTruncateTable().contains(false),
      "Spark would refuse the truncate path and drop the table instead")
    assert(postgres.getTruncateQuery("source_trades") ==
      "TRUNCATE TABLE ONLY source_trades",
      "not the ONLY form — would cascade into inheriting partitions")
  }

  test("Derby live leg and Postgres dialect agree on type round-trip intent") {
    import org.apache.spark.sql.types._
    val derby = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    // both dialects must accept the same writable types (a column the
    // Derby leg proves writable must have a Postgres DDL too)
    for (dt <- Seq(LongType, IntegerType, DoubleType, StringType,
        BooleanType, TimestampType, DateType, DecimalType(38, 18))) {
      val p = postgres.getJDBCType(dt)
      assert(p.isDefined || org.apache.spark.sql.execution.datasources
        .jdbc.JdbcUtils.getCommonJDBCType(dt).isDefined,
        s"$dt writable on Derby but unmapped for Postgres")
      val d = derby.getJDBCType(dt).orElse(
        org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(dt))
      assert(d.isDefined, s"$dt has no Derby mapping — live leg can't cover it")
    }
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
