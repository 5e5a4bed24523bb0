package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star/snowflake join assembly (SURVEY.md §2.5).
  *
  * The reference pushes one SQL string to Postgres:
  * fact ⋈ instruments ⋈ assets ⋈ categories ⋈ exchanges
  * (mabna_tables_create.py:235-243) and iv ⋈ indexes (:286-288).
  * Here the dims are explicitly `broadcast()` — they are orders of
  * magnitude smaller than the fact, so at 100 TB the fact table never
  * shuffles for these joins (BroadcastHashJoin on every hop).
  */
object Joins {

  /** J1 — 4-hop snowflake around a fact table, realized on the fixtures
    * as lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    * `orders` is fact-sized (1/4 of lineitem) so it stays a shuffle
    * (sort-merge / shuffled-hash chosen by Catalyst+AQE); the true dims
    * (customer, nation, region) broadcast. */
  def prdTrades(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                nation: DataFrame, region: DataFrame): DataFrame = {
    val stg = Transforms.stgTrades(lineitem)
    stg
      .join(orders, stg("l_orderkey") === orders("o_orderkey"), "inner")
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "inner")
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "inner")
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "inner")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("j_date"),
        col("l_quantity"), col("l_extendedprice"), col("pct_change"),
        col("o_orderpriority"),
        col("c_name").as("customer"),
        col("n_name").as("nation"),
        col("r_name").as("region"))
  }

  /** J1 + F2 — the production-trades query: snowflake join windowed by
    * the lexicographic date-string BETWEEN (mabna_tables_create.py:244).
    *
    * Implementation note: `j_date BETWEEN 'y/m/d' AND 'y/m/d'` on the
    * derived zero-padded string is equivalent to a half-open timestamp
    * range on the source `l_shipdate` — but the string form costs six
    * date_format calls per row inside the scan filter and can never use
    * parquet row-group stats. Rewriting to the sargable timestamp bounds
    * turns F2 into a PushedFilter with min/max pruning; at 100 TB that
    * is the difference between scanning 4 years and scanning 3. */
  def prdTradesWindowed(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, nation: DataFrame,
                        region: DataFrame, lo: String, hi: String): DataFrame = {
    def day(s: String) = java.time.LocalDate.parse(s.replace('/', '-'))
    val loTs = day(lo).atStartOfDay()
    val hiTs = day(hi).plusDays(1).atStartOfDay()
    val windowed = lineitem.filter(
      col("l_shipdate") >= lit(loTs) && col("l_shipdate") < lit(hiTs))
    prdTrades(windowed, orders, customer, nation, region)
  }

  /** AS-OF (point-in-time) join: each fact row picks the latest dim row
    * with the same key and dim time ≤ fact time — the temporal lookup a
    * versioned dimension (the reference's `meta.version` world) needs.
    *
    * Spark has no ASOF operator; the naive theta-join (`f.t >= d.t`)
    * explodes to a range join. This is the scalable composition: tag
    * and union both sides, ONE shuffle on the key, then a running
    * `last(dim, ignoreNulls)` window ordered by (time, side) carries
    * the latest dim state onto every fact row. Cost: one shuffle + one
    * per-partition sort, independent of match distances. Dim rows sort
    * before fact rows at equal times, giving `≤` semantics. Facts with
    * no prior dim row keep null dim columns (left-join shape).
    *
    * Determinism contract: `dim` must be unique per (key, time) — with
    * duplicates the window picks an arbitrary one. Pre-aggregate (as
    * q38 does with max(event_id) per timestamp) when the source can
    * carry duplicates. */
  def asofJoin(fact: DataFrame, dim: DataFrame, key: String,
               factTime: String, dimTime: String,
               dimCols: Seq[String]): DataFrame = {
    val factCols = fact.columns.toSeq
    val f = fact.select(
      col(key).as("__k"), col(factTime).as("__t"), lit(1).as("__side"),
      struct(factCols.map(col): _*).as("__fact"),
      lit(null).cast(dim.select(dimCols.map(col): _*).schema.catalogString)
        .as("__dim"))
    val d = dim.select(
      col(key).as("__k"), col(dimTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(fact.select(factCols.map(col): _*).schema.catalogString)
        .as("__fact"),
      struct(dimCols.map(col): _*).as("__dim"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    f.union(d)
      .withColumn("__matched", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(factCols.map(c => col(s"__fact.$c").as(c)) ++
        dimCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** AS-OF join with a skew guard: [[asofJoin]] partitions by key only,
    * so at corpus scale one hot key's entire history sorts in a single
    * partition. This variant shards the timeline into `bucketWidth`-wide
    * buckets and partitions by (key, bucket) — a hot key's cost drops
    * from O(history) to O(history / #buckets) per task.
    *
    * State does not leak across bucket boundaries by accident: the
    * latest dim row of each (key, dim-bucket) is reduced first
    * (`max_by`, one small aggregate), then the carry-in for every
    * (key, fact-bucket) is resolved with the *plain* as-of join over
    * those per-bucket summaries — rows per key there = #buckets with
    * dim data, so the recursion runs on metadata-scale input. Carry
    * rows are injected at each fact-bucket's start, ordered before real
    * dim rows at the same instant (side 0 < 1 < 2), and the final
    * window runs within (key, bucket).
    *
    * Time columns must be integral (cast timestamps to epoch units
    * first); bucket ids use exact integer floor division, so int64
    * microsecond timestamps never round through a double. Output
    * equals [[asofJoin]] exactly (AsofJoinSpec pins the equivalence on
    * random and hot-key fixtures). */
  def asofJoinBucketed(fact: DataFrame, dim: DataFrame, key: String,
                       factTime: String, dimTime: String,
                       dimCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val factCols = fact.columns.toSeq
    // exact integral floor division: long `/` in Spark coerces to
    // DOUBLE, which rounds above 2^53 (ns-epoch times are ~1.7e18) and
    // could land a row one bucket off its carry row. The numerator is
    // an exact multiple of the width, so a decimal divide yields the
    // exact integer quotient at any long magnitude.
    def bucketOf(t: Column): Column =
      ((t - pmod(t, lit(bucketWidth))).cast("decimal(38,0)") /
        lit(bucketWidth).cast("decimal(38,0)")).cast("long")

    val dimSchema = dim.select(dimCols.map(col): _*).schema.catalogString
    val factSchema = fact.select(factCols.map(col): _*).schema.catalogString

    // latest dim state at the end of each (key, dim-bucket)
    val lastPerBucket = dim
      .select(col(key).as("__k"), col(dimTime).cast("long").as("__t"),
        struct(dimCols.map(col): _*).as("__dim"))
      .groupBy(col("__k"), bucketOf(col("__t")).as("__b"))
      .agg(max_by(col("__dim"), col("__t")).as("__dim"))

    // carry-in per (key, fact-bucket): as-of over bucket summaries —
    // strictly-before semantics via the fb-1 probe on integer buckets
    val factBuckets = fact
      .select(col(key).as("__k"),
        bucketOf(col(factTime).cast("long")).as("__fb"))
      .distinct()
    val carries = asofJoin(
      factBuckets.withColumn("__q", col("__fb") - 1),
      lastPerBucket, "__k", "__q", "__b", Seq("__dim"))
      .filter(col("__dim").isNotNull)
      .select(col("__k"), (col("__fb") * bucketWidth).as("__t"),
        lit(0).as("__side"), col("__fb").as("__b"),
        lit(null).cast(factSchema).as("__fact"), col("__dim"))

    val f = fact.select(
      col(key).as("__k"), col(factTime).cast("long").as("__t"),
      lit(2).as("__side"), bucketOf(col(factTime).cast("long")).as("__b"),
      struct(factCols.map(col): _*).as("__fact"),
      lit(null).cast(dimSchema).as("__dim"))
    val d = dim.select(
      col(key).as("__k"), col(dimTime).cast("long").as("__t"),
      lit(1).as("__side"), bucketOf(col(dimTime).cast("long")).as("__b"),
      lit(null).cast(factSchema).as("__fact"),
      struct(dimCols.map(col): _*).as("__dim"))

    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    f.union(d).union(carries)
      .withColumn("__matched", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__side") === 2)
      .select(factCols.map(c => col(s"__fact.$c").as(c)) ++
        dimCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** RANGE (interval-containment) join: probe rows match interval rows
    * with the same key-less predicate `lo ≤ v ≤ hi`.
    *
    * The naive theta-join is a cross product; this is the bucketized
    * composition: every interval is exploded onto the fixed-width
    * buckets it overlaps (⌈width/bucketWidth⌉+1 rows — intervals must
    * be narrow relative to bucketWidth for the fan-out to stay small),
    * probes land in exactly one bucket, and the match becomes an
    * equi-join on bucket id plus an exact containment filter. One
    * shuffle keyed by bucket; output equals the theta-join exactly. */
  def rangeJoin(probes: DataFrame, probeCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    val b = lit(bucketWidth)
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / b).cast("long"),
        floor(col(hiCol) / b).cast("long"))))
    val keyed = probes.withColumn("__bucket",
      floor(col(probeCol) / b).cast("long"))
    keyed.join(exploded, Seq("__bucket"))
      .filter(col(probeCol) >= col(loCol) && col(probeCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** J2 — 2-way equi-join (stg_indexvalues ⋈ indexes,
    * mabna_tables_create.py:286-288), realized as events ⋈ customer on
    * user_id = c_custkey with the dim broadcast. */
  def eventsWithUser(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer), events("user_id") === customer("c_custkey"), "inner")
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("c_name").as("user_name"),
        col("c_mktsegment").as("user_segment"))
}
