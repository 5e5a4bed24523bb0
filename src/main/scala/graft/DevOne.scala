package graft
import org.apache.spark.sql.SparkSession

/** Scratch runner: dump ONE named query + its oracle SQL (dev only). */
object DevOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/$name.sql"),
      SparkEntry.oracleSql(name))
    spark.stop()
  }
}
