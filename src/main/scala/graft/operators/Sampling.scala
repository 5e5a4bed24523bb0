package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` is partition-order-dependent: a retry, a different
  * split plan, or AQE re-coalescing changes WHICH rows survive — poison
  * for reproducible training mixes and for incremental pipelines where
  * yesterday's sample must not churn. Everything here keys off a 60-bit
  * salted md5 of a stable row id instead: membership is a pure function
  * of (id, seed), so any engine — including the DuckDB oracle — selects
  * byte-identical rows, and re-running over a grown corpus keeps every
  * previously-selected row (hash-threshold consistency).
  *
  * At 100 TB: [[hashSample]] is a shuffle-free codegen'd filter pushed
  * into the scan stage; [[stratifiedSample]] costs one shuffle keyed by
  * stratum (the unavoidable minimum for exact per-stratum counts).
  */
object Sampling {

  /** 2^60 — the hash space of the 15-hex-char md5 prefix. */
  val Space: Long = 1L << 60

  /** 60-bit salted hash of a stable id: uniform on [0, 2^60).
    * Mirror in DuckDB: `('0x' || substr(md5(id::VARCHAR || seed), 1,
    * 15))::BIGINT`. All built-ins, fully codegen'd. */
  def hashKey(e: Column, seed: String): Column =
    conv(substring(md5(concat(e.cast("string"), lit(seed))), 1, 15), 16, 10)
      .cast("long")

  /** Integer threshold for a sampling rate — computed once on the
    * driver so the Spark filter and the SQL oracle compare against the
    * same literal (no cross-engine float drift). */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate outside [0,1]")
    math.round(rate * Space.toDouble)
  }

  /** Deterministic Bernoulli-by-hash sample: keeps exactly the rows
    * whose hash key falls below rate·2^60. Shuffle-free, stable under
    * retries and re-partitioning, monotone in `rate` (raising the rate
    * only ADDS rows — a grown sample is a superset of the old one). */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 seed: String = "graft"): DataFrame =
    df.filter(hashKey(col(idCol), seed) < lit(threshold(rate)))

  /** Exact stratified sample: within each stratum keep the
    * ceil(frac·|stratum|) rows with the smallest (hash, id) — exact
    * quota per stratum (a Bernoulli filter only hits the quota in
    * expectation), deterministic tie-break via the unique id. `fracs`
    * overrides the default fraction per stratum value — the per-source
    * mixing-weights shape of a training-mix config. One shuffle. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       defaultFrac: Double,
                       fracs: Map[String, Double] = Map.empty,
                       seed: String = "graft"): DataFrame = {
    (defaultFrac +: fracs.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0,1]"))
    val fracCol = fracs.foldLeft(lit(defaultFrac)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val byStratum = Window.partitionBy(col(stratumCol))
    val ranked = byStratum.orderBy(hashKey(col(idCol), seed), col(idCol))
    df.withColumn("__rn", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(byStratum))
      .filter(col("__rn") <= ceil(fracCol * col("__n")))
      .drop("__rn", "__n")
  }
}
