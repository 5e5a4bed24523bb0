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
    time("scan count (2nd)")(li.count())

    time("plain long-ish agg") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), count(lit(1))).collect()
    }

    time("q07 full (1st)") {
      SparkEntry.queries("q07_agg_pricing_summary")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q07 full (2nd)") {
      SparkEntry.queries("q07_agg_pricing_summary")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }

    time("q09 full (1st)") {
      SparkEntry.queries("q09_exact_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q09 full (2nd)") {
      SparkEntry.queries("q09_exact_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
