package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.operators.TableStore
import graft.sources.api.{ApiTransport, TransportRegistry}

class PipelineSpec extends SparkSpec {

  private val yaml =
    """instrument_types: [share, bond]
      |collections:
      |  exchange: [trades, news]
      |  stock: [instruments]
      |""".stripMargin

  test("EndpointRegistry fans trades out by instrument type") {
    val specs = EndpointRegistry.fromYaml(yaml)
    assert(specs.map(_.tableName).toSet == Set(
      "src_exchange_trades_share", "src_exchange_trades_bond",
      "src_exchange_news", "src_stock_instruments"))
    assert(specs.find(_.tableName == "src_exchange_trades_share").get.endpoint ==
      "exchange/trades?instrument.type=share")
  }

  /** Serves version-stamped records; version ceiling bumps per call so
    * incremental runs see new data. */
  private class VersionedTransport(maxVersion: Int) extends ApiTransport {
    override def fetch(endpoint: String, params: Map[String, String]): String = {
      val wm = params.getOrElse("meta.version", "0").toLong
      val recs = (1 to maxVersion).filter(_ > wm).map { v =>
        s"""{"id": $v, "name": "${endpoint.takeWhile(_ != '?')}-$v", "meta": {"version": $v}}"""
      }
      s"""{"data": [${recs.mkString(",")}]}"""
    }
  }

  test("full refresh + incremental refresh converge through the store") {
    val root = Files.createTempDirectory("graft-pipe").toString
    val store = TableStore(spark, root)
    TransportRegistry.register("pipe-v5", new VersionedTransport(5))
    val specs = EndpointRegistry.fromYaml(yaml)
    val pipe = new Pipeline(spark, store, "pipe-v5")

    val counts = pipe.fullRefresh(specs)
    assert(counts.values.forall(_.isSuccess))
    assert(counts("src_exchange_news").get == 5L)

    // new data arrives (versions 6..8); incremental picks up only those
    TransportRegistry.register("pipe-v5", new VersionedTransport(8))
    val inc = pipe.incrementalRefresh(specs)
    assert(inc.values.forall(_.isSuccess))
    assert(inc("src_exchange_news").get == 3L)
    assert(store.read("source", "src_exchange_news").count() == 8L)

    // transform + load with keep-last dedup
    val t = pipe.transform(Map(
      "src_exchange_news" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.select(col("id"), col("name"), col("meta_version")))))
    assert(t("src_exchange_news").isSuccess)
    val loaded = pipe.load("prd_news",
      s => s.read("staging", "src_exchange_news"),
      keys = Seq("id"), versionCol = "meta_version")
    assert(loaded.isSuccess && loaded.get == 8L)
  }

  test("per-table error isolation: one bad endpoint never fails the run") {
    val root = Files.createTempDirectory("graft-pipe-err").toString
    val store = TableStore(spark, root)
    val attempts = new AtomicInteger
    TransportRegistry.register("pipe-flaky", new ApiTransport {
      override def fetch(e: String, p: Map[String, String]): String = {
        if (e.startsWith("exchange/news")) throw new RuntimeException("boom")
        attempts.incrementAndGet()
        """{"data": [{"id": 1, "meta": {"version": 1}}]}"""
      }
    })
    val pipe = new Pipeline(spark, store, "pipe-flaky", retries = 2)
    val out = pipe.fullRefresh(EndpointRegistry.fromYaml(yaml))
    assert(out("src_exchange_news").isFailure)
    assert(out.count(_._2.isSuccess) == 3) // the other tables landed
  }

  test("Retry retries the configured number of times") {
    val n = new AtomicInteger
    val r = Retry.retrying(3) {
      if (n.incrementAndGet() < 3) sys.error("transient") else "ok"
    }
    assert(r.isSuccess && n.get() == 3)
    val f = Retry.retrying(2)(sys.error("always"))
    assert(f.isFailure && f.failed.get.getMessage == "always")
  }
}
