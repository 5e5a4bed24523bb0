package graft

import org.apache.spark.sql.functions._

/** End-to-end integrity laws for the q139 closed-loop curation
  * pipeline — the properties a training-data batch MUST satisfy no
  * matter how the stages are tuned. The DuckDB oracle certifies the
  * exact row set; these pin the contract the row set has to obey, so a
  * future re-tuning that stays hash-green cannot silently break the
  * loop's guarantees (e.g. a benchmark doc leaking into the corpus
  * while every stage still "matches its oracle"). */
class CurationSpec extends SparkSpec {

  private def out = SparkEntry.queries("q139_curation_e2e")(
    spark, "/root/testdata/sf0.001")

  test("curated corpus: no benchmark doc, no dropped duplicate, " +
       "budgets honored, splits cluster-pure") {
    val rows = out.localCheckpoint(true)
    assert(rows.count() > 0, "curation produced an empty corpus")
    // 1. the held-out benchmark slice (doc_id % 10 = 7) NEVER appears
    assert(rows.filter(col("doc_id") % 10 === 7).count() == 0,
      "a benchmark document leaked into the curated corpus")
    // 2. exact dedup held: no two output docs share a normalized text
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val joined = rows.join(d.select("doc_id", "text"), "doc_id")
    val nTexts = joined
      .select(graft.operators.TextOps.normalizeText(col("text"))).distinct().count()
    assert(nTexts == rows.count(),
      "two curated docs share a normalized text — exact dedup leaked")
    // 3. per-source BPE budget is a hard ceiling on admitted tokens
    val spend = rows.groupBy("source").agg(sum("bpe_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spend.foreach { case (src, t) =>
      val budget = src match {
        case "src0" => 15000L
        case "src1" => 0L
        case _      => 2400L
      }
      assert(t <= budget, s"source $src spent $t > budget $budget")
    }
    assert(!spend.contains("src1"), "src1 has budget 0 but admitted docs")
    // 4. leakage-safe split: a cluster never straddles splits
    val impure = rows.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(impure == 0, s"$impure clusters straddle train/val/test")
  }
}
