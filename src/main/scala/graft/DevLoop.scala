package graft
import org.apache.spark.sql.SparkSession

/** Scratch: time one named query N times in a warm session (dev only). */
object DevLoop {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, n) = args
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.split(",").foreach { name =>
      (1 to n.toInt).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
