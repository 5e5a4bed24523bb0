package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Shuffle-shaping utilities for the 100 TB plans (build brief:
  * "broadcast small dims, repartition/bucketing for co-located joins,
  * salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handling (on in every graft session) splits skewed
  * sort-merge partitions automatically; explicit salting remains the
  * tool when one key dominates a SHUFFLED HASH join or an aggregation,
  * and bucketing is the tool when the same big join runs repeatedly.
  */
object Shuffles {

  /** Per-row salt in [0, salts): a DETERMINISTIC hash of every column
    * of the row. Deterministic matters twice — a task retry recomputes
    * the same salt (a `monotonically_increasing_id` salt changes under
    * retry, which can double/drop rows mid-shuffle on a flaky cluster),
    * and the projection carries no nondeterministic expression, so the
    * optimizer stays free to push filters through it. Hashing ALL
    * columns (not just the join key — xxhash64(key) is one value per
    * key, which would send the entire hot key to ONE salt bucket and
    * defeat the salting) spreads a skewed key over the salt space via
    * the row's other fields. */
  private def rowSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col) :+ lit(0x9e3779b9L): _*),
      lit(salts.toLong)).cast("int")

  /** Skew-proof inner equi-join of a big (skewed) table against a
    * smaller one. The big side gets a per-row salt; the small side is
    * replicated once per salt value; the join key becomes
    * (key, salt) — one dominant key now spreads over `salts`
    * partitions instead of hot-spotting one reducer.
    * Result is exactly the plain inner equi-join. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-proof grouped count: two-phase aggregation via salting —
    * partial count per (key, salt), then final rollup per key. The
    * partial agg is map-side combinable so the hot key's traffic is
    * already collapsed before the first shuffle. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__c"))
      .groupBy(col(key)).agg(sum(col("__c")).as("n"))

  /** Write a table bucketed (+ sorted) on its join key. Subsequent
    * equi-joins between tables bucketed the same way need NO exchange —
    * the shuffle is paid once at write time, amortized over every later
    * join (the reference joins the same dim tables on every 15-minute
    * batch). Requires a catalog table (bucketing metadata lives there). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
