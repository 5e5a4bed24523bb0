package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: SCD2 effective-dated history and
  * snapshot diffing.
  *
  * The reference's warehouse keeps only the latest state — every batch
  * is replace or append+dedup (mabna_tables_create.py:58-59,
  * mabna_tables_update.py:271-280), so history is lost and there is no
  * way to ask "what changed between runs". These two operators are the
  * standard warehouse answers, shaped for Spark:
  *
  *  - [[scd2]] builds a type-2 slowly-changing-dimension history from
  *    an event/version log: consecutive rows per key with IDENTICAL
  *    tracked values collapse into one effective-dated version
  *    (valid_from / valid_to / is_current). ONE hash shuffle on the
  *    key; the three window passes (change detect, effective dating,
  *    version numbering) share the same partitioning+ordering so
  *    Catalyst plans them over a single Exchange (pinned).
  *
  *  - [[snapshotDiff]] classifies every key across two snapshots as
  *    inserted / deleted / changed / unchanged. Full-outer join on the
  *    key; when both inputs are already hash-partitioned on the key
  *    (e.g. each side is a [[Dedup.keepLast]]), the join itself adds NO
  *    exchange — the diff reuses the snapshots' partitioning (pinned in
  *    PlanContractSpec). At 100 TB this makes period-over-period
  *    auditing cost two aggregations, not three shuffles.
  */
object Cdc {

  /** Build an SCD2 history. `tracked` are the columns whose changes
    * open a new version; rows where every tracked column is null-safe
    * equal to the key's previous row are collapsed into the version
    * opened by the first change. `tieBreak` must make (tsCol, tieBreak)
    * a total order per key — effective dating is part of the semantics,
    * so ties must be deterministic.
    *
    * Output: keys ++ (version, tracked..., valid_from, valid_to,
    * is_current); `valid_to` is null on the open (current) version.
    */
  def scd2(df: DataFrame, keys: Seq[String], tsCol: String,
           tieBreak: Seq[Column], tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak).map(_.asc): _*)
    val state = struct(tracked.map(col): _*)
    // Change detection: null-safe compare against the previous row's
    // tracked state (plain =!= would drop rows whose state contains a
    // null). The filter keeps partitioning, so the second window pass
    // below re-sorts but does NOT re-shuffle.
    val changes = df
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> state))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) :+ col("version")) ++ tracked.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Diff two snapshots of a keyed table. Output: one row per key
    * present in either side, with `status` ∈ inserted | deleted |
    * changed | unchanged and the old/new value of every compare column.
    * Comparison is null-safe per column. Keys must be non-null (they
    * identify rows; a null key has no identity to diff on).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__in_old"): _*)
    val n = newSnap.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__in_new"): _*)
    val same = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "inserted")
          .when(col("__in_new").isNull, "deleted")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("__in_old", "__in_new")
      .select((keys.map(col) :+ col("status")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
