package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: lay documents out in a
  * deterministic order and assign each to the context-window "bin" its
  * running token count falls into.
  *
  * The layout rule is contiguous fill: within a shard, docs are ordered
  * by id and doc i goes to bin floor(prefixTokens_i / budget), where
  * prefixTokens is the EXCLUSIVE prefix sum — a pure function of the
  * shard's content, so the packing is reproducible and SQL-expressible
  * (one window). Documents are never split across bins by reassignment
  * (a doc straddling a budget boundary stays in the bin its start falls
  * into — the downstream writer pads or overflows, the standard
  * streaming-pack contract).
  *
  * Scale note: the window partitions by `shardCol`, never a global
  * ORDER BY — a global ordered window collapses to one task at corpus
  * scale. Shards (source file, domain, date...) bound the sequential
  * unit; prefix sums use exact integer arithmetic (no double rounding
  * however large the shard).
  */
object Packing {

  // exact at any long magnitude: long `/` coerces to DOUBLE (rounds
  // above 2^53); the numerator is an exact multiple of d, so a decimal
  // divide returns the exact integer quotient
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))).cast("decimal(38,0)") /
      lit(d).cast("decimal(38,0)")).cast("long")

  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
                    tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__prefix",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin", floorDiv(col("__prefix"), budgetTokens))
      .withColumn("bin_offset", col("__prefix") - col("bin") * budgetTokens)
      .drop("__prefix")
  }
}
