package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for local experiments; not part of the library surface. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[dev] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()

    val li = Tables.lineitem(spark, dir)
    time("scan count")(li.count())

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // q01 decomposition: where do the 3 s go?
    time("q01 full (1st)")(noop(SparkEntry.queries("q01_stg_trades")(spark, dir)))
    time("q01 full (2nd)")(noop(SparkEntry.queries("q01_stg_trades")(spark, dir)))
    time("transforms only, no sort") {
      noop(graft.operators.Transforms.stgTrades(li))
    }
    time("sort only") {
      noop(li.orderBy("l_orderkey", "l_linenumber"))
    }

    time("q02 full")(noop(SparkEntry.queries("q02_prd_trades_star")(spark, dir)))
    time("q39 full")(noop(SparkEntry.queries("q39_range_join")(spark, dir)))
    time("q29 full")(noop(SparkEntry.queries("q29_part_supplier_rev")(spark, dir)))
    time("q37 full")(noop(SparkEntry.queries("q37_ann_ivf")(spark, dir)))

    spark.stop()
  }
}
