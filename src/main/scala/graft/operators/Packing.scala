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
                    tokensCol: String, budgetTokens: Long): DataFrame =
    packItems(docs, shardCol, Seq(idCol), tokensCol, budgetTokens)

  /** [[packSequences]] generalized to a composite layout order —
    * needed when the packable unit is finer than a document (chunks,
    * media attachments) and the within-doc order must survive the
    * fill. Same contiguous-fill rule, same one-window plan. */
  def packItems(items: DataFrame, shardCol: String, orderCols: Seq[String],
                tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    items
      .withColumn("__prefix",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin", floorDiv(col("__prefix"), budgetTokens))
      .withColumn("bin_offset", col("__prefix") - col("bin") * budgetTokens)
      .drop("__prefix")
  }

  /** Interleaved multimodal packing — the VLM-training layout: a
    * document is a SEQUENCE of items (an image placeholder, then its
    * text in context-window chunks), every item carries its token
    * cost (text = its token count; an image = the model's fixed
    * per-image patch budget), and the item stream packs into
    * context-window bins with the doc's internal order preserved.
    *
    * Items: docs satisfying `hasMedia` contribute one 'image' item at
    * item_idx 0 costing `imageTokens`; every doc contributes its
    * [[TextOps.chunkDocuments]] chunks (overlap 0) as 'text' items at
    * item_idx = chunk_idx + 1 costing the chunk's token count. The
    * fill is [[packItems]] over (shard, doc, item) — one window per
    * shard, never global. `doc_straddles` marks docs whose items
    * landed in more than one bin (the downstream writer's
    * attention-mask/resume boundary); it is a second window over the
    * SAME partition-friendly key (doc), not a join.
    */
  def packInterleaved(docs: DataFrame, shardCol: String, idCol: String,
                      textCol: String, hasMedia: Column, imageTokens: Long,
                      chunkTokens: Int, budgetTokens: Long): DataFrame = {
    require(imageTokens > 0, "imageTokens must be positive")
    val media = docs.filter(hasMedia)
      .select(col(shardCol), col(idCol), lit(0L).as("item_idx"),
        lit("image").as("modality"), lit(imageTokens).as("cost_tokens"))
    val text = TextOps.chunkDocuments(docs, idCol, textCol, chunkTokens,
        overlap = 0, carry = Seq(shardCol))
      .select(col(shardCol), col(idCol),
        (col("chunk_idx") + 1).cast("long").as("item_idx"),
        lit("text").as("modality"),
        col("n_tokens").cast("long").as("cost_tokens"))
    val packed = packItems(media.unionByName(text), shardCol,
      Seq(idCol, "item_idx"), "cost_tokens", budgetTokens)
    val perDoc = Window.partitionBy(col(idCol))
    packed.withColumn("doc_straddles",
      min(col("bin")).over(perDoc) =!= max(col("bin")).over(perDoc))
  }
}
