package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, emits ONE JSON result line on stdout AND writes
  * the identical JSON to `bench.json` (cwd, or `SPARK_GRAFT_BENCH_OUT`).
  * Each query reports the MEDIAN of `SPARK_GRAFT_BENCH_REPS` runs
  * (default 3) plus the per-query min→max spread.
  *
  * Round-1 postmortem (VERDICT §wrong 2-3): the stdout line alone was
  * unparseable — sbt decorates it with `[info]` and the function-registry
  * WARN storm preceded it — and exceptions were swallowed as fast times.
  * Now: file artifact + per-query `err` strings + stdout line kept last.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT/codegen/parquet-footer caches, so the first measured
    // query isn't charged the session's fixed costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q04_watermark_max")
      .foreach(fn => fn(spark, sfDir).collect())
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // median-of-N per query (default 3): run-to-run noise at sf0.1 is
    // ±15% (BENCH_HISTORY.md) — a single sample hides real regressions
    // of the same size. `spread` (max − min over the reps) is reported
    // per query so a noisy median is visibly noisy.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        if (err.isEmpty) times += (System.nanoTime() - t0) / 1e9
        r += 1
      }
      val sorted = times.sorted
      val median = if (sorted.isEmpty) 0.0 else sorted(sorted.size / 2)
      val spread = if (sorted.isEmpty) 0.0 else sorted.last - sorted.head
      (name, median, spread, err)
    }
    // a crashed query's elapsed time is noise, not a result — keep it out
    // of the per-query map and the total so failures can't read as fast
    // successes; failed names live only in `errors`
    val qs = results.collect { case (k, v, _, None) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val spreads = results.collect { case (k, _, s, None) => jstr(k) + ":" + s }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, None) => v }.sum
    val nFailed = results.count(_._4.isDefined)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"spread":$spreads,"errors":$errs,"n_failed":$nFailed,"sf":${jstr(sfDir)}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    // last line of output, after Spark's shutdown logging is done
    println(json)
    System.out.flush()
  }
}
