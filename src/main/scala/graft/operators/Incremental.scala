package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental micro-batch engine (SURVEY.md §2.9, §2.2, §2.6).
  *
  * Reference shape (mabna_tables_update.py):
  *   1. watermark recovery — per-table `SELECT MAX("meta.version")`
  *      (:86-98); the destination table IS the state store;
  *   2. incremental read filtered `version > wm` (:137);
  *   3. append (:58-59);
  *   4. keep-last dedup repair (:271-280).
  *
  * Re-expressed: the watermark probe is a scalar agg (parquet
  * footer-min/max makes it a metadata-mostly scan), the filter pushes
  * down, the append is an atomic parquet append, the dedup is W1's
  * single-shuffle window instead of a full rewrite.
  */
object Incremental {

  /** A1 — watermark probe: ungrouped MAX over the version column.
    * Returns None on an empty/absent table (first run). */
  def maxWatermark(df: DataFrame, versionCol: String): Option[Long] =
    df.agg(max(col(versionCol)).cast("long")).first() match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }

  /** F3 — the incremental filter `version > wm`; pushed to the scan. */
  def newerThan(df: DataFrame, versionCol: String, wm: Option[Long]): DataFrame =
    wm.fold(df)(w => df.filter(col(versionCol) > lit(w)))
}

/** Layered table store (SURVEY.md §1.1): the reference's
  * source/staging/production Postgres schemas become directory prefixes
  * over parquet. At cluster scale the same API fronts a catalog; the
  * pipeline code never changes.
  */
final case class TableStore(spark: SparkSession, root: String) {
  private def path(layer: String, table: String) = s"$root/$layer/$table"

  def write(layer: String, table: String, df: DataFrame, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(path(layer, table))

  /** K1 — full replace (`to_sql if_exists='replace'`). */
  def replace(layer: String, table: String, df: DataFrame): Unit =
    write(layer, table, df, SaveMode.Overwrite)

  /** K2 — append (`to_sql if_exists='append'`). */
  def append(layer: String, table: String, df: DataFrame): Unit =
    write(layer, table, df, SaveMode.Append)

  def read(layer: String, table: String): DataFrame =
    spark.read.parquet(path(layer, table))

  def exists(layer: String, table: String): Boolean =
    new java.io.File(s"${path(layer, table)}/_SUCCESS").exists()

  /** S5+A1 — probe every table of a layer for its max version
    * (the reference's `max_meta_versions(schema)` dict,
    * mabna_tables_update.py:73-98). */
  def probeWatermarks(layer: String, versionCol: String): Map[String, Long] = {
    val dir = new java.io.File(s"$root/$layer")
    val tables = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
    tables.flatMap { t =>
      Incremental.maxWatermark(read(layer, t), versionCol).map(t -> _)
    }.toMap
  }

  /** One micro-batch hop: filter the incoming batch past the stored
    * watermark, append, then keep-last repair. Returns the repaired
    * table. This is the reference's update-DAG body for one table. */
  def incrementalUpsert(layer: String, table: String, batch: DataFrame,
                        versionCol: String, keys: Seq[String],
                        ordering: Seq[Column]): DataFrame = {
    val wm = if (exists(layer, table))
      Incremental.maxWatermark(read(layer, table), versionCol) else None
    val fresh = Incremental.newerThan(batch, versionCol, wm)
    append(layer, table, fresh)
    val repaired = Dedup.keepLast(read(layer, table), keys, ordering)
    // The reference rewrites the whole table each batch (O(total));
    // partition-pruned MERGE is the scale path — here the repaired view
    // is returned and only persisted when the caller asks.
    repaired
  }
}
