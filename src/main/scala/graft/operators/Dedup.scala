package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 — keep-last-per-key dedup (SURVEY.md §2.7).
  *
  * Reference semantics (mabna_tables_update.py:271-280): read the whole
  * table `ORDER BY "meta.version"`, pandas `drop_duplicates(keys,
  * keep='last')` — i.e. per key retain the row with the greatest version.
  * NOT `dropDuplicates(keys)` (arbitrary row); ordering is part of the
  * semantics. Tie-breaking on equal versions is physical-order-dependent
  * in pandas; here it is made deterministic via the caller-supplied
  * ordering columns (document the full order).
  *
  * Scale: one shuffle on the key columns, no global sort, no full
  * rewrite — at 100 TB this is the difference between the reference's
  * O(table) rewrite per 15-min batch and a partition-pruned merge.
  */
object Dedup {

  /** Window formulation: `row_number` over (keys, ordering desc), keep
    * rank 1. One hash-partition shuffle + per-partition sort. */
  def keepLast(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Agg formulation: `max_by(struct(*), orderingKey)` — partial
    * aggregation happens map-side, so less data crosses the shuffle than
    * the window form when duplication is heavy. Requires a single
    * ordering column (compose one if needed, e.g. struct(ts, id)). */
  def keepLastMaxBy(df: DataFrame, keys: Seq[String], orderingKey: Column): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val packed = struct(valueCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(packed, orderingKey).as("__kept"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__kept.$c").as(c)): _*)
  }
}
