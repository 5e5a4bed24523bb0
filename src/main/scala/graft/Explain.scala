package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(32)
    val q = args(0)
    val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"time: ${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
