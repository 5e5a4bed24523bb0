package graft
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.functions.TextHashFunctions
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    TextHashFunctions.register(spark)
    val idx = d.select(col("doc_id"), explode(TextHashFunctions.shingleHash60(col("text"), 3)).as("h"))
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    t("idx noop")(idx.write.format("noop").mode("overwrite").save())
    val postings = idx.groupBy(col("h")).agg(collect_list(col("doc_id")).as("ds")).filter(size(col("ds")) >= 2)
    t("postings noop")(postings.write.format("noop").mode("overwrite").save())
    val pairs = postings.select(explode(TextHashFunctions.sortedPairs(col("ds"))).as("p"))
    t("pairs count")(println("npairs=" + pairs.count()))
    val agg = pairs.groupBy("p.id_a","p.id_b").agg(count(lit(1)).as("c"))
    t("agg noop")(agg.write.format("noop").mode("overwrite").save())
    // df distribution
    postings.select(size(col("ds")).as("df")).groupBy("df").count().orderBy(desc("df")).show(10)
    spark.stop()
  }
}
