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

  /** Audit→action skew join: measure, decide, salt ONLY what needs it.
    * [[graft.operators.Stats.skewAudit]] measures (q145);
    * [[saltedEquiJoin]] salts everything, paying `salts`× replication
    * of the WHOLE small side (q64). This closes the loop between them:
    * the audit's decision rule runs inline — a key is hot when its
    * fact-side share reaches `thresholdPpm` (exact integer arithmetic,
    * `key_rows · 10⁶ ≥ thresholdPpm · total`, the same ppm convention
    * the audit reports) — and the join splits: hot fact rows carry the
    * per-row salt with only the small side's HOT rows replicated
    * `salts`×, cold rows join plain under salt 0 with zero
    * replication. Result ≡ the plain inner equi-join whatever the
    * threshold (q148's oracle certifies the rewrite; the decision is
    * made visible by the query's audit column, not by the join rows).
    *
    * Scale: the hot set is bounded BY CONSTRUCTION — at most
    * 10⁶/thresholdPpm keys can each hold that share — so it always
    * broadcasts; the key-count aggregate is the audit's own map-side
    * combinable shape; the dim side is scanned once. At a 1% threshold
    * the replication overhead is ≤ 100·salts dim rows, vs
    * |dim|·salts for the indiscriminate q64 form. */
  def saltedJoinBySkew(fact: DataFrame, dim: DataFrame, key: String,
                       salts: Int, thresholdPpm: Long): DataFrame =
    saltedJoinHot(fact, dim, key, salts,
      hotKeysByShare(fact, key, thresholdPpm))

  /** The decision half of [[saltedJoinBySkew]]: keys holding at least
    * `thresholdPpm` of `fact`'s rows (exact integer ppm — the q145
    * audit's convention). Bounded by construction: at most
    * 10⁶/thresholdPpm keys can each hold that share. Split out so a
    * pipeline pays the one fact-scan audit ONCE and reuses the hot set
    * across every join of the batch window — the audit artifact is
    * key-list-sized state, exactly like a q145 report. */
  def hotKeysByShare(fact: DataFrame, key: String,
                     thresholdPpm: Long): DataFrame = {
    require(thresholdPpm >= 1 && thresholdPpm <= 1000000L,
      s"thresholdPpm=$thresholdPpm must be a ppm share in [1, 1e6]")
    val counts = fact.groupBy(col(key)).agg(count(lit(1)).as("__kr"))
    val total = counts.agg(sum("__kr").as("__tot"))
    counts.crossJoin(broadcast(total))
      .filter(col("__kr") * lit(1000000L) >= lit(thresholdPpm) * col("__tot"))
      .select(col(key))
  }

  /** The action half: join with exactly `hotKeys` taking the salted
    * path (fact rows spread over `salts`, dim rows replicated
    * `salts`×) and every other key joining plain under salt 0.
    * Result ≡ the plain inner equi-join for ANY hot set — correctness
    * never depends on the audit being current, only the skew
    * protection does. The hot set is deduplicated here (a duplicate
    * hot key would multiply every matching fact row through the tag
    * join, breaking the any-hot-set contract; [[hotKeysByShare]] is
    * distinct by construction but arbitrary callers aren't). */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, key: String,
                    salts: Int, hotKeys: DataFrame): DataFrame = {
    require(salts > 0, s"salts=$salts must be positive")
    val hot = hotKeys.select(col(key)).distinct()
      .select(col(key), lit(true).as("__hot"))
    val saltedFact = fact.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), rowSalt(fact, salts)).otherwise(lit(0)))
      .drop("__hot")
    val saltedDim = dim.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), array((0 until salts).map(lit): _*))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
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
