package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch: dump `.explain("formatted")` for a list of queries into
  * files (dev only) — the plans/r19 evidence capture. Usage:
  * runMain graft.DevPlans <outDir> <q1,q2,...> [sfDir] */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { prefix =>
      val full = SparkEntry.queries.keys.find(_.startsWith(prefix)).get
      val df = SparkEntry.queries(full)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/$full.txt"), plan)
      println(s"[devplans] wrote $full (${plan.length} chars)")
    }
    spark.stop()
  }
}
