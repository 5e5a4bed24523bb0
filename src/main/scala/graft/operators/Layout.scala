package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Data-layout operators: Hive-style partitioned parquet writes and
  * partition-pruned reads.
  *
  * At 100 TB, partition pruning is the difference between scanning a
  * directory and scanning a corpus: a layout partitioned on the
  * dominant filter column (event day, source, language) turns any
  * predicate on that column into DIRECTORY-LISTING elision — files of
  * non-matching partitions are never opened, never even stat'd by the
  * scan. This is Catalyst's cheapest pushdown (it happens at file-index
  * time, before split planning), but only if the writer laid the data
  * out for it; these helpers are the write side of that contract.
  * (Mirrors the reference's per-table replace/append layout decision —
  * mabna_tables_create.py writes whole tables flat; at its data size
  * flat is fine, at ours partitioning is load-bearing.)
  */
object Layout {

  /** Write `df` as a Hive-partitioned parquet layout under `path`, one
    * directory per distinct value tuple of `partCols`. Choose LOW-
    * cardinality columns (day, source, lang): each partition should
    * hold many row groups, not the reverse — a high-cardinality
    * partition column shatters the table into tiny files and the
    * listing itself becomes the bottleneck. */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCols: _*).parquet(path)

  /** Read a partitioned layout back. Partition columns come back as
    * real columns (parsed from directory names); any filter on them
    * prunes at the file index — `PartitionFilters` in the scan node,
    * pinned by PlanContractSpec. */
  def readPartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
}
