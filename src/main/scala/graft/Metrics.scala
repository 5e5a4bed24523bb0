package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** K3 — row-count reporting, engine-grade (SURVEY.md §2.2).
  *
  * The reference prints `len(df)` after every write
  * (mabna_tables_create.py:62) — which costs a second full evaluation
  * per table. A QueryExecutionListener reads the `numOutputRows` metric
  * the write already collected: zero extra passes, every action
  * observed, works unchanged on a cluster. */
final class RowCountListener extends QueryExecutionListener {
  /** funcName → rows of the most recent successful action. */
  val lastCounts: TrieMap[String, Long] = TrieMap.empty

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    rows.foreach(r => lastCounts.put(funcName, r))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()
}

object Metrics {
  /** Attach a fresh row-count listener to the session. */
  def attach(spark: SparkSession): RowCountListener = {
    val l = new RowCountListener
    spark.listenerManager.register(l)
    l
  }
}
