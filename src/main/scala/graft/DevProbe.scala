package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.ArrayMath

/** Scratch: profile the banded cosine pair path at storm scale (dev only). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ArrayMath.register(spark)
    val ebig = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        expr("transform(embedding, (x, i) -> double(x) + 0.003 * (pmod(copy * 31 + i, 7) - 3))")
          .as("embedding"))
      .localCheckpoint(true)
    val n = ebig.count()
    println(s"[probe] $n vectors")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($r rows)")
    }
    val nPlanes = Similarity.autoPlanes(n)
    println(s"[probe] autoPlanes = $nPlanes, nTables = 16")
    val b = Similarity.lshBuckets(ebig, "embedding", nPlanes, 16)
      .select(col("vec_id"), col("table"), col("bucket"))
      .localCheckpoint(true)
    time("buckets") { b.count() }
    time("bucket-join candidates (pre-distinct)") {
      val l = b.select(col("vec_id").as("id_a"), col("table"), col("bucket"))
      val r = b.select(col("vec_id").as("id_b"), col("table"), col("bucket"))
      l.join(r, Seq("table", "bucket")).filter(col("id_a") < col("id_b")).count()
    }
    time("distinct ids-only") {
      val l = b.select(col("vec_id").as("id_a"), col("table"), col("bucket"))
      val r = b.select(col("vec_id").as("id_b"), col("table"), col("bucket"))
      l.join(r, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
    }
    time("full cosineDedupPairs") {
      Similarity.cosineDedupPairs(ebig, "vec_id", "embedding", 0.9, nPlanes, 16).count()
    }
    spark.stop()
  }
}
