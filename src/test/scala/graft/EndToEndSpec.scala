package graft

import java.nio.file.Files

import scala.io.Source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TableStore, Transforms}
import graft.sources.JsonFlatten
import graft.sources.api.{ApiTransport, TransportRegistry}

/** End-to-end smoke over reference-shaped JSON fixtures (FIXTURES.md §B):
  * the full three-phase pipeline — extract (envelope → flatten) →
  * staging (project/dropna/j_date/pct) → production (snowflake join +
  * date window + keep-last dedup) — with every §B edge case asserted:
  * null-drop, ±Infinity pct, array-element extract, W1 versioned dedup,
  * F2 window, empty-categories drop. */
class EndToEndSpec extends SparkSpec {

  /** Serves the authored fixture files by endpoint. */
  private object FixtureTransport extends ApiTransport {
    override def fetch(endpoint: String, params: Map[String, String]): String = {
      val name = endpoint.replace("exchange/", "").replace("stock/", "")
        .replaceAll("\\?instrument.type=", "_")
      val in = getClass.getResourceAsStream(s"/fixtures/mabna/$name.json")
      require(in != null, s"no fixture for endpoint $endpoint → $name")
      try Source.fromInputStream(in).mkString finally in.close()
    }
  }

  test("three-phase reference pipeline over Mabna-shaped fixtures") {
    TransportRegistry.register("fixtures", FixtureTransport)
    val root = Files.createTempDirectory("graft-e2e").toString
    val store = TableStore(spark, root)
    val specs = EndpointRegistry.fromYaml(
      """instrument_types: [share, bond]
        |collections:
        |  exchange: [trades, news, indexvalues, instruments, assets,
        |             categories, exchanges, indexes]
        |""".stripMargin)
    val pipe = new Pipeline(spark, store, "fixtures")

    // -------- phase 1: extract (S1/S3/K1) --------
    val counts = pipe.fullRefresh(specs)
    assert(counts.values.forall(_.isSuccess), counts.filter(_._2.isFailure))
    assert(counts("src_exchange_trades_share").get == 6L)
    assert(counts("src_exchange_assets").get == 3L)

    // nested objects flattened; arrays of structs pass through (S3)
    val srcAssets = store.read("source", "src_exchange_assets")
    assert(srcAssets.schema("categories").dataType.typeName == "array")

    // -------- phase 2: staging transforms (P1/F1/X1/X2/P5) --------
    def stgTrades(df: DataFrame): DataFrame = {
      val projected = Transforms.project(df, Seq("id", "date_time",
        "close_price", "close_price_change", "instrument_id", "meta_version"))
      val cleaned = Transforms.dropNullRows(projected, Seq("id", "date_time",
        "close_price", "close_price_change", "instrument_id"))
      val withDate = Transforms.insertAt(cleaned, "j_date",
        Transforms.slashDateFromCompact(col("date_time")), 2)
      Transforms.insertAt(withDate, "pct",
        Transforms.pctChange(col("close_price_change"), col("close_price")), 5)
    }
    val t = pipe.transform(Map(
      "src_exchange_trades_share" -> stgTrades _,
      "src_exchange_trades_bond" -> stgTrades _))
    assert(t.values.forall(_.isSuccess))
    val stgShare = store.read("staging", "src_exchange_trades_share")
    assert(stgShare.count() == 5) // null close_price row dropped (F1)
    // X2: change == close → +Infinity like pandas
    val infRow = stgShare.filter(col("id") === 911004).first()
    assert(infRow.getAs[Double]("pct").isPosInfinity)
    // X1 positional insert: j_date at ordinal 2
    assert(stgShare.columns(2) == "j_date")

    // -------- phase 3: production (J1 snowflake + F2 window + W1 dedup) --------
    val instruments = store.read("source", "src_exchange_instruments")
    val assets = Transforms.dropNullRows(
      store.read("source", "src_exchange_assets"), Seq("categories"))
      .withColumn("category_id",
        JsonFlatten.firstElementField(col("categories"), "id"))
    val cats = store.read("source", "src_exchange_categories")
    val exch = store.read("source", "src_exchange_exchanges")

    val prd = pipe.load("prd_exchange_trades_share",
      s => {
        val stg = s.read("staging", "src_exchange_trades_share")
        stg
          .join(broadcast(instruments.select(col("id").as("i_id"),
            col("name"), col("stock_company_id").as("company_id"),
            col("asset_id"), col("exchange_id"))),
            col("instrument_id") === col("i_id"), "inner")
          .join(broadcast(assets.select(col("id").as("a_id"), col("category_id"))),
            col("asset_id") === col("a_id"), "inner")
          .join(broadcast(cats.select(col("id").as("c_id"),
            col("short_name").as("category"))),
            col("category_id") === col("c_id"), "inner")
          .join(broadcast(exch.select(col("id").as("e_id"),
            col("title").as("market"))),
            col("exchange_id") === col("e_id"), "inner")
          .filter(Transforms.dateStrBetween(col("j_date"),
            "1399/01/01", "1401/12/29"))
          .select("id", "j_date", "name", "close_price", "pct",
            "category", "market", "meta_version")
      },
      keys = Seq("j_date", "name"), versionCol = "meta_version")
    assert(prd.isSuccess, prd)

    val out = store.read("production", "prd_exchange_trades_share")
    // 5 staged rows: the 1398 row fails F2; (1401/12/25, AcmeShare) and
    // (1401/12/26, BetaShare) each collapse to their higher meta_version
    assert(out.count() == 2)
    val beta = out.filter(col("name") === "BetaShare").first()
    assert(beta.getAs[Long]("meta_version") == 500400L)
    assert(beta.getAs[Double]("pct").isPosInfinity) // the kept row is the Inf one
    val dup = out.filter(col("j_date") === "1401/12/25" &&
      col("name") === "AcmeShare").first()
    assert(dup.getAs[Long]("meta_version") == 500200L) // W1 kept the latest
    // X3: assets.categories[0].id drove the category join
    assert(dup.getAs[String]("category") == "CatA")
    assert(dup.getAs[String]("market") == "Main Market")
    // asset 83 (null categories) never joined anything
    assert(assets.filter(col("id") === 83).count() == 0)
  }

  test("news dedup key (j_date, title) keeps the latest body") {
    TransportRegistry.register("fixtures", FixtureTransport)
    val root = Files.createTempDirectory("graft-e2e-news").toString
    val store = TableStore(spark, root)
    val pipe = new Pipeline(spark, store, "fixtures")
    pipe.fullRefresh(Seq(EndpointSpec("exchange", "news")))
    val t = pipe.transform(Map("src_exchange_news" -> ((df: DataFrame) => {
      val cleaned = Transforms.dropNullRows(
        Transforms.project(df, Seq("id", "date_time", "title", "text", "meta_version")),
        Seq("id", "date_time", "title"))
      Transforms.insertAt(cleaned, "j_date",
        Transforms.slashDateFromCompact(col("date_time")), 2)
    })))
    assert(t.values.forall(_.isSuccess))
    val deduped = Dedup.keepLast(store.read("staging", "src_exchange_news"),
      Seq("j_date", "title"), Seq(col("meta_version")))
    assert(deduped.count() == 2)
    val kept = deduped.filter(col("title") === "t1").first()
    assert(kept.getAs[String]("text") == "body1-updated")
  }
}
