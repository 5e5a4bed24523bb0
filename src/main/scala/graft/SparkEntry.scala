package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Incremental, Joins, Transforms}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the large-scale-pipeline
  * extensions) is represented as a named query over the driver test
  * tables, with a DuckDB-equivalent oracle where SQL-expressible.
  *
  * Conventions keeping the DuckDB hash-compare exact:
  *  - every query ends in a total deterministic ORDER BY;
  *  - no raw timestamps in outputs — `events.ts` is read as Long nanos
  *    (spark.sql.legacy.parquet.nanosAsLong; oracle: `epoch_ns(ts)`),
  *    other timestamps are formatted to strings;
  *  - double aggregations route through DECIMAL sums cast back to
  *    double, so results are order-independent and bit-identical across
  *    engines (plain double sums differ in the last ulps by partial-agg
  *    order).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_prd_trades_star")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- parity

  /** §3.3 staging-trades pipeline: P1 project → F1 dropna → X1 compact
    * date slice → X2 pct-change, on lineitem. */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Transforms.stgTrades(Tables.lineitem(s, dir))
      .orderBy("l_orderkey", "l_linenumber")

  /** J1 snowflake star join + F2 date-string window (prd_trades). */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Joins.prdTradesWindowed(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
      Tables.nation(s, dir), Tables.region(s, dir),
      "1994/01/01", "1996/12/31")
      .orderBy("l_orderkey", "l_linenumber")

  /** J2 two-way broadcast equi-join (stg_indexvalues ⋈ indexes shape). */
  private def q03(s: SparkSession, dir: String): DataFrame =
    Joins.eventsWithUser(Tables.events(s, dir), Tables.customer(s, dir))
      .orderBy("event_id")

  /** A1 watermark probe: ungrouped MAX. */
  private def q04(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(max(col("event_id")).as("wm"))

  /** `events.ts` (Long nanos) truncated to micros — DuckDB truncates
    * ns-parquet to its µs TIMESTAMP on read, so µs is the precision both
    * engines share. */
  private def tsUs = expr("ts DIV 1000")

  /** F3 incremental filter past a watermark. */
  private def q05(s: SparkSession, dir: String): DataFrame =
    Incremental.newerThan(Tables.events(s, dir), "event_id", Some(5000L))
      .select(col("event_id"), tsUs.as("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("event_id")

  /** W1 keep-last-per-key dedup over events, key (user_id, event_type),
    * version order (ts µs, event_id) — µs so the ordering semantics match
    * the oracle's timestamp resolution exactly. */
  private def q06(s: SparkSession, dir: String): DataFrame =
    Dedup.keepLast(Tables.events(s, dir).withColumn("ts_us", tsUs).drop("ts"),
        Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("user_id", "event_type")

  /** Map-side-combinable grouped aggregation (pricing summary — the
    * engine-completeness agg the reference lacks, SURVEY.md §2.11).
    * DECIMAL-routed sums for cross-engine exactness. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
        ).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Top-k with deterministic tie-break (sort + limit). */
  private def q08(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_stg_trades" -> q01,
    "q02_prd_trades_star" -> q02,
    "q03_join_events_users" -> q03,
    "q04_watermark_max" -> q04,
    "q05_incremental_filter" -> q05,
    "q06_keeplast_dedup" -> q06,
    "q07_agg_pricing_summary" -> q07,
    "q08_topk_orders" -> q08,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_stg_trades" ->
      """SELECT l_orderkey, l_partkey, j_date,
        |       l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, pct_change, l_tax, l_returnflag, l_linestatus, date_time
        |FROM (
        |  SELECT *,
        |         strftime(l_shipdate, '%Y%m%d%H%M%S') AS date_time,
        |         concat_ws('/', substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 1, 4),
        |                        substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 5, 2),
        |                        substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 7, 2)) AS j_date,
        |         l_discount / (l_extendedprice - l_discount) AS pct_change
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |    AND l_suppkey IS NOT NULL AND l_linenumber IS NOT NULL
        |    AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_shipdate IS NOT NULL
        |)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_prd_trades_star" ->
      """SELECT l_orderkey, l_linenumber,
        |       concat_ws('/', substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 1, 4),
        |                      substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 5, 2),
        |                      substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 7, 2)) AS j_date,
        |       l_quantity, l_extendedprice,
        |       l_discount / (l_extendedprice - l_discount) AS pct_change,
        |       o_orderpriority,
        |       c_name AS customer, n_name AS nation, r_name AS region
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |  AND l_suppkey IS NOT NULL AND l_linenumber IS NOT NULL
        |  AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  AND l_discount IS NOT NULL AND l_shipdate IS NOT NULL
        |  AND concat_ws('/', substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 1, 4),
        |                     substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 5, 2),
        |                     substr(strftime(l_shipdate, '%Y%m%d%H%M%S'), 7, 2))
        |      BETWEEN '1994/01/01' AND '1996/12/31'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_events_users" ->
      """SELECT event_id, user_id, event_type, value,
        |       c_name AS user_name, c_mktsegment AS user_segment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,
    "q04_watermark_max" ->
      "SELECT max(event_id) AS wm FROM events",
    "q05_incremental_filter" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events WHERE event_id > 5000
        |ORDER BY event_id""".stripMargin,
    "q06_keeplast_dedup" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q07_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
        |         AS sum_disc_price,
        |       count(*) AS count_order,
        |       sum(l_quantity) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q08_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
  )
}
