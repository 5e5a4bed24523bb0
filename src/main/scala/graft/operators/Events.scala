package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-behavior analytics over event streams — the funnel/cohort
  * pair every product-analytics workload runs (reference scope: the
  * engine-completeness surface next to q26 user analytics and q33
  * sessionization).
  *
  * Determinism contract shared by both: event order is the total order
  * (ts, tieCol) — callers pass a timestamp column at the precision the
  * comparison should happen at (the driver tables compare in µs so the
  * DuckDB oracle sees the same ties) and a unique tiebreaker, so
  * "strictly after" is engine-exact.
  */
object Events {

  /** Ordered funnel depth per user: how many of `steps` the user
    * completed IN ORDER, each step strictly after the previous one
    * (the classic "earliest qualifying event" greedy, which is optimal
    * for funnel reach). Returns (userCol, depth) for every user seen
    * in `events` — depth 0 = never did step 1.
    *
    * Shape at scale: one filtered min-aggregate per step (map-side
    * combined, |users| groups) and one user-keyed join per step —
    * steps are few and fixed, so this is a bounded chain of slim
    * shuffles; no windows over raw events, no per-user sorting. */
  def funnelDepth(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, tieCol: String,
                  steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val users = events.select(col(userCol).as("__u")).distinct()
    val ord = struct(col(tsCol), col(tieCol))
    var frontier = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u")).agg(min(ord).as("__t"))
    var reached = Vector(frontier.select(col("__u"), lit(1).as("__d")))
    steps.drop(1).foreach { st =>
      frontier = events.filter(col(typeCol) === st)
        .join(frontier.withColumnRenamed("__u", userCol), userCol)
        .where(ord > col("__t"))
        .groupBy(col(userCol).as("__u")).agg(min(ord).as("__t"))
      reached :+= frontier.select(col("__u"),
        lit(reached.size + 1).as("__d"))
    }
    val depths = reached.reduce(_ union _)
      .groupBy("__u").agg(max(col("__d")).as("__d"))
    users.join(depths, Seq("__u"), "left")
      .select(col("__u").as(userCol),
        coalesce(col("__d"), lit(0)).as("depth"))
  }

  /** Cohort retention matrix: users grouped by their first-activity
    * period, counted in every later period they return. `periodExpr`
    * is an integer period index column (e.g. `ts_us DIV week_µs`).
    * Output: (cohort_period, period_offset, n_users) — n_users
    * DISTINCT users of that cohort active at that offset; offset 0 is
    * the cohort's own size. Two aggregates + one user-keyed join, all
    * integer arithmetic. */
  def cohortRetention(events: DataFrame, userCol: String,
                      periodCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(min(col(periodCol)).as("cohort_period"))
    events.select(col(userCol), col(periodCol))
      .distinct()
      .join(firsts, userCol)
      .groupBy(col("cohort_period"),
        (col(periodCol) - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
