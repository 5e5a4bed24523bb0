package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** File-format I/O (SURVEY.md §2.11: the reference never touches
  * CSV/ORC/JSON files — Spark supplies them at zero cost; this pins the
  * round-trips actually work with the engine's session configs). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", 1.5, "1401/01/01"),
    (2L, "b", -2.25, "1401/06/31"),
    (3L, "c,with,commas", 0.0, "1402/12/29")
  ).toDF("id", "name", "v", "j_date")

  test("csv round-trip with header and quoting") {
    val dir = Files.createTempDirectory("graft-csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 3)
    assert(back.filter($"id" === 3).first().getAs[String]("name") == "c,with,commas")
  }

  test("orc round-trip preserves types") {
    val dir = Files.createTempDirectory("graft-orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // files read back as nullable; names + types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sample.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("json-lines round-trip") {
    val dir = Files.createTempDirectory("graft-json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 3)
    assert(back.filter($"id" === 2).first().getAs[Double]("v") == -2.25)
  }
}
