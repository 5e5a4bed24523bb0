package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write/read round-trips rows and prunes directories") {
    val dir = Files.createTempDirectory("graft-layout-spec").toString
    val df = (1 to 1000).map(i => (i.toLong, i % 10, s"p$i")).toDF("id", "bucket", "payload")
    Layout.writePartitioned(df, dir, "bucket")
    // one directory per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).sorted
    assert(dirs.length == 10, s"expected 10 partition dirs, got ${dirs.toSeq}")
    val back = Layout.readPartitioned(spark, dir)
    assert(back.count() == 1000)
    // a partition-column filter lands in PartitionFilters, and only the
    // matching rows come back
    val filtered = back.filter(col("bucket") === 3)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
        plan.substring(plan.indexOf("PartitionFilters: [")).take(120).contains("bucket"),
      s"bucket filter not a partition filter:\n$plan")
    assert(filtered.count() == 100)
  }
}
