package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** Streaming near-duplicate detection: q75's probe-the-store loop as a
  * genuinely continuous query. In batch form the LSH signature store is
  * a parquet artifact and each increment probes it; here the engine's
  * per-group state IS the store — one bounded id list per (band,
  * band_key) bucket, maintained by the streaming checkpoint — and a
  * document emits its candidate pairs the moment it arrives, instead of
  * on the next 15-minute cycle (the reference's cadence,
  * mabna_tables_update.py).
  */
object DedupStream {

  case class CandidatePair(id_a: Long, id_b: Long)

  /** Stateful LSH candidate pairs over an unbounded document stream.
    *
    * Each arriving document is signed ONCE (the codegen'd minhash
    * kernel — row-local, no state), its band rows are grouped by
    * bucket, and every new member pairs with the ids already retained
    * for that bucket. Emission is at-least-once per pair (a pair
    * agreeing on several bands emits once per agreeing band; dedup
    * belongs to the downstream exact-verify join, same as the batch
    * engine's candidate stage).
    *
    * State is BOUNDED by construction, the property an endless crawl
    * needs: at most `maxPerBucket` ids per bucket. A bucket past cap is
    * a degenerate near-dup cluster — later arrivals still pair against
    * the retained representatives (enough to CLUSTER them with the
    * batch connected-components pass) but are not retained themselves,
    * so a pathological hot bucket cannot grow state without limit.
    * Re-delivery (at-least-once sources): a RETAINED member's
    * re-delivery is a membership no-op and emits nothing new. A doc
    * that arrived while its bucket was already at cap was never
    * retained, so its re-delivery re-emits its pairs against the
    * retained representatives — duplicate PAIRS, never duplicate
    * state, and the downstream exact-verify join (which must already
    * absorb the once-per-agreeing-band multiplicity above) dedups
    * them with no extra machinery. */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 64, bands: Int = 16,
                        maxPerBucket: Int = 32): Dataset[CandidatePair] = {
    require(maxPerBucket >= 1, s"maxPerBucket=$maxPerBucket must be >= 1")
    import docs.sparkSession.implicits._
    val bandRows = TextOps.lshBands(
        TextOps.minhashSignatures(docs.select(col(idCol), col(textCol)),
          idCol, textCol, n, k), idCol, k, bands)
      .select(col(idCol).cast("long").as("id"),
        col("band").cast("int").as("band"),
        col("band_key").cast("long").as("band_key"))
      .as[(Long, Int, Long)]
    bandRows
      .groupByKey { case (_, band, key) => (band, key) }
      .flatMapGroupsWithState[List[Long], CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[List[Long]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
          rows.foreach { case (id, _, _) =>
            if (!members.contains(id)) {
              out ++= members.iterator.map(m =>
                CandidatePair(math.min(m, id), math.max(m, id)))
              if (members.size < maxPerBucket) members = id :: members
            }
          }
          state.update(members)
          out.iterator
      }
  }
}
