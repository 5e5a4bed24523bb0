package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy matching — the edit-distance complement to
  * the token-set dedup family (TextOps): n-gram Jaccard and MinHash
  * see REORDERED copies well but miss dense character-level edits;
  * blocked edit distance catches near-identical records (boilerplate
  * variants, OCR noise, templated spam) and is the classic entity-
  * resolution shape for joining dirty reference data.
  *
  * Scale design — blocking IS the operator:
  *  - candidate generation is an equi-join on a deterministic block
  *    key (normalized text prefix), never an all-pairs cross join;
  *  - blocks are capped at `maxBlockSize` rows (smallest ids kept, a
  *    deterministic, replayable rule) so one degenerate key — a
  *    billion empty documents — cannot go quadratic; the cap is the
  *    same discipline as Sampling's two-phase stratum cap, chosen
  *    here for exact oracle replay;
  *  - the expensive comparator runs only inside blocks, on bounded
  *    `comparePrefix`-char slices, with Spark's threshold'd
  *    `levenshtein` so the DP early-exits past `maxDist`.
  *
  * Exactness: normalization (lower/trim/whitespace-collapse), the
  * block key, the cap rule, and Levenshtein distance are all
  * integer/string-deterministic — a SQL engine replays the whole
  * pipeline including the reported distances.
  */
object Linkage {

  /** Candidate near-identical pairs by blocked edit distance.
    * Output: (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist —
    * Levenshtein over the first `comparePrefix` chars of the
    * whitespace-normalized lowercased text. */
  def blockedFuzzyPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockPrefix: Int = 12, comparePrefix: Int = 64,
                        maxDist: Int = 16, maxBlockSize: Int = 64): DataFrame = {
    require(blockPrefix > 0 && comparePrefix >= blockPrefix,
      s"bad prefixes block=$blockPrefix compare=$comparePrefix")
    require(maxDist >= 0 && maxBlockSize >= 2,
      s"bad bounds maxDist=$maxDist maxBlockSize=$maxBlockSize")
    val norm = docs.select(
      col(idCol).as("__id"),
      lower(trim(regexp_replace(col(textCol), "\\s+", " "))).as("__norm"))
      .withColumn("__blk", substring(col("__norm"), 1, blockPrefix))
      .withColumn("__cmp", substring(col("__norm"), 1, comparePrefix))
      .select("__id", "__blk", "__cmp")
    // deterministic block cap: keep the maxBlockSize smallest ids.
    // Stats.topKPerGroup compiles to a WindowGroupLimit plan — each
    // map task pre-prunes to k rows per block before the one shuffle.
    val capped = Stats.topKPerGroup(norm, "__blk", maxBlockSize,
      Seq(col("__id").asc)).drop("rank")
    val a = capped.select(col("__blk"), col("__id").as("id_a"),
      col("__cmp").as("__ca"))
    val b = capped.select(col("__blk"), col("__id").as("id_b"),
      col("__cmp").as("__cb"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      // threshold'd Levenshtein: the DP abandons a row pair once it
      // can no longer come in under maxDist (returns -1 past it)
      .withColumn("dist",
        levenshtein(col("__ca"), col("__cb"), maxDist).cast("long"))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
