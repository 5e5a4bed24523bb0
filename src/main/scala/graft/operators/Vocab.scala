package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token vocabulary construction — the id-assignment step every
  * tokenizer-training / feature-hashing pipeline needs: count token
  * occurrences over the corpus, drop the sub-`minCount` tail, and
  * assign dense 1-based ids in (count DESC, token ASC) order so id 1 is
  * the most frequent token (the convention BPE/WordPiece vocab files
  * use).
  *
  * The interesting part at scale is the RANK, not the count. The naive
  * `row_number() OVER (ORDER BY cnt DESC, token)` moves the whole
  * vocabulary through ONE window partition — a single reducer sorting
  * 10M+ rows at web-corpus scale. Instead the rank is decomposed the
  * same way [[Sampling.shufflePositions]] decomposes its shuffle order:
  *
  *  1. bucket every vocab row by the VALUE pair (cnt, token-prefix) —
  *     value-derived, so recomputation lands every row in the same
  *     bucket (no range-sampler nondeterminism, no partition-id
  *     dependence);
  *  2. cumulative bucket offsets from a histogram of bucket sizes —
  *     metadata-sized (≤ #distinct-counts × #prefixes rows), the one
  *     single-partition window, run over the histogram not the data;
  *  3. in-bucket `row_number()` ordered by token — parallel across
  *     buckets, and the heavy count=1 singleton tail is split across
  *     prefixes instead of landing on one reducer.
  *
  * Global id = offset + in-bucket rank. Exact (ranks are a total order
  * over a bijection of the rows), deterministic, and no task ever sees
  * more than one (count, prefix) slice of the vocabulary. */
object Vocab {

  /** Corpus vocabulary: `(token, cnt, vocab_id)`.
    *
    * @param minCount  drop tokens seen fewer times (vocab truncation)
    * @param prefixLen bucket-splitting prefix length for the in-count
    *                  tie-break order; longer = more, smaller buckets
    *                  (raise it if a single first-char slice of the
    *                  singleton tail could still swamp one task) */
  def vocabulary(docs: DataFrame, textCol: String,
                 minCount: Long = 1L, prefixLen: Int = 1): DataFrame =
    vocabularyFromState(tokenCountState(docs, textCol), minCount, prefixLen)

  /** Mergeable token-count state: `(token, cnt)` for one corpus slice.
    * Counts are sum-decomposable, so vocabulary maintenance is
    * incremental for free: keep the state per ingested batch (or one
    * rolling merged state), [[mergeTokenCountState]] on refresh, and
    * re-rank only the merged STATE — token counting, the part that
    * scales with corpus bytes, runs once per batch, never again over
    * history. (The reference's create-or-replace loop would recount
    * the whole corpus per refresh.) */
  def tokenCountState(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Merge [[tokenCountState]] snapshots: sum-of-counts per token —
    * exact and associative for ANY slicing of the corpus (the law
    * VocabSpec pins: merge ≡ recount from scratch). */
  def mergeTokenCountState(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("token").agg(sum(col("cnt")).as("cnt"))

  /** Rank a (possibly merged) token-count state into the final
    * `(token, cnt, vocab_id)` vocabulary. */
  def vocabularyFromState(state: DataFrame, minCount: Long = 1L,
                          prefixLen: Int = 1): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    require(prefixLen >= 1, s"prefixLen=$prefixLen must be >= 1")
    rankedBy(state.where(col("cnt") >= minCount), col("cnt"),
        descending = true, substring(col("token"), 1, prefixLen),
        orderInBucket = col("token"), outCol = "vocab_id")
      .select("token", "cnt", "vocab_id")
  }

  /** Dense 1-based global rank in (bucketVal, inBucket) order without a
    * data-sized window: cumulative offsets over the bucket-size
    * histogram + in-bucket row_number. `bucketVal` is the leading sort
    * VALUE (a plain column — SortOrder expressions cannot live in a
    * projection); `descending` picks its direction, applied only inside
    * window orderings. `bucketSub` splits ties of the leading key into
    * parallel slices and must be a PREFIX of `orderInBucket`'s order
    * (bucket boundaries may not interleave the in-bucket order). */
  /** The bucket-size histogram [[rankedBy]]'s only unpartitioned window
    * runs over: ONE row per distinct (bucketVal, bucketSub) pair. Its
    * cardinality is the scale contract that makes that window safe —
    * bounded by |distinct bucketVal| × |distinct bucketSub|, never by
    * the data (duplicating a corpus multiplies every count in place,
    * so the histogram does NOT grow — VocabSpec pins this growth
    * invariance, and pins the bound itself, on this real construction
    * rather than a spec-side re-implementation). A caller who hands
    * rankedBy a near-unique bucketVal (e.g. raw doubles) breaks the
    * bound and the spec's contract documents that as the misuse. */
  private[graft] def bucketHistogram(df: DataFrame, bucketVal: Column,
                                     bucketSub: Column): DataFrame =
    df.withColumn("__b1", bucketVal).withColumn("__b2", bucketSub)
      .groupBy("__b1", "__b2").agg(count(lit(1)).as("__n"))

  private[graft] def rankedBy(df: DataFrame, bucketVal: Column,
                                  descending: Boolean,
                                  bucketSub: Column, orderInBucket: Column,
                                  outCol: String): DataFrame = {
    val bucketed = df.withColumn("__b1", bucketVal).withColumn("__b2", bucketSub)
    val b1Ord = if (descending) col("__b1").desc else col("__b1").asc
    val histW = Window.orderBy(b1Ord, col("__b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketHistogram(df, bucketVal, bucketSub)
      .withColumn("__off", coalesce(sum(col("__n")).over(histW), lit(0L)))
      .select("__b1", "__b2", "__off")
    val rn = row_number().over(
      Window.partitionBy(col("__b1"), col("__b2")).orderBy(orderInBucket))
    bucketed.join(broadcast(offsets), Seq("__b1", "__b2"))
      .withColumn(outCol, col("__off") + rn.cast("long"))
      .drop("__b1", "__b2", "__off")
  }
}
