package graft
import org.apache.spark.sql.functions._
import graft.operators.TextOps
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    t("shingleIndex count")(println(TextOps.shingleIndex(d, "doc_id", "text", 3).count()))
    t("signatures")(TextOps.minhashSignatures(d, "doc_id", "text", 3, 64)
      .write.format("noop").mode("overwrite").save())
    t("jaccardPairs")(TextOps.jaccardPairs(d, "doc_id", "text", 3, 0.5)
      .write.format("noop").mode("overwrite").save())
    t("minhashFull")(TextOps.minhashDedupPairs(d, "doc_id", "text", 3, 0.8)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
