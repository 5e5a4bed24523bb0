package graft
import org.apache.spark.sql.functions._
object Prof3 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val dir = "/root/testdata/sf0.1"
    val li = Tables.lineitem(spark, dir)
    t("q01 full")(SparkEntry.queries("q01_stg_trades")(spark, dir).write.format("noop").mode("overwrite").save())
    t("q01 no-sort")(graft.operators.Transforms.stgTrades(li).write.format("noop").mode("overwrite").save())
    t("lineitem raw scan")(li.write.format("noop").mode("overwrite").save())
    t("q09 full")(SparkEntry.queries("q09_exact_dedup")(spark, dir).write.format("noop").mode("overwrite").save())
    val d = Tables.documents(spark, dir)
    t("documents raw")(d.write.format("noop").mode("overwrite").save())
    t("q09 no-sort")(graft.operators.TextOps.exactDedup(d, "doc_id", "text").write.format("noop").mode("overwrite").save())
    t("q09 again")(SparkEntry.queries("q09_exact_dedup")(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
