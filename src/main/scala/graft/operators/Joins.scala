package graft.operators

import org.apache.spark.sql.DataFrame
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
