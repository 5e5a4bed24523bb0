package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-bucket-safe pigeonhole machinery for Hamming near-dup families
  * (SimHash text pairs, perceptual-hash media pairs, and the phash
  * store probes).
  *
  * The round-17 adjudication found the shared scale-killer in every
  * banded self-join: the (chunk, chunk_val) equi-join had no
  * identical-hash collapse, so a real crawl's mega-cluster of m
  * hash-identical rows (blank thumbnails, placeholder GIFs,
  * byte-identical docs — the single most common dedup input) put m
  * rows in one bucket and the join emitted O(m² · chunks) rows into
  * the shuffle *before* the distinct. The fix is NOT a lossy cap: all
  * m rows collapse to ONE banding representative per distinct hash
  * value, the pigeonhole join runs over distinct hashes only, and the
  * (exactly output-sized) member expansion happens after — every row
  * the shuffle carries is either a distinct-hash candidate or a final
  * output row, so a planted 40%-duplicate corpus costs the same join
  * as a distinct one. Semantics are unchanged by construction
  * (members inherit their representative's distances: identical
  * hashes are at distance 0 of each other and at their group's
  * distance of everything else) — HammingCollapseSpec pins
  * collapse ≡ brute-force on duplicate-heavy fixtures, and the
  * existing q14/q182-q188 oracles replay the brute force in DuckDB.
  *
  * Naming: callers pass any id/hash column names; internals use
  * `__`-prefixed temporaries so no user column can collide. */
object Hamming {

  /** Pigeonhole band keys over DISTINCT hash values: split `bits` into
    * (maxDist+1) chunks — any two values within Hamming distance
    * maxDist agree exactly on at least one chunk (pigeonhole), so the
    * chunk equi-join is a complete candidate generator. The last chunk
    * absorbs the remainder bits. Arithmetic-vs-logical shift is
    * immaterial: the mask keeps only in-range bits. */
  private def bandKeys(hashes: DataFrame, hashCol: String, bits: Int,
                       maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val cw = bits / nChunks
    val chunks = (0 until nChunks).map { c =>
      val b = if (c == nChunks - 1) bits - c * cw else cw
      val mask = if (b == 64) -1L else (1L << b) - 1
      struct(lit(c).as("chunk"),
        shiftright(col(hashCol), c * cw).bitwiseAND(lit(mask))
          .as("chunk_val"))
    }
    hashes
      .select(col(hashCol), explode(array(chunks: _*)).as("__ck"))
      .select(col(hashCol), col("__ck.chunk").as("chunk"),
        col("__ck.chunk_val").as("chunk_val"))
  }

  /** All UNORDERED pairs of DISTINCT hash values within `maxDist`:
    * (__ha < __hb, __hd = their Hamming distance). The pigeonhole join
    * runs over one row per distinct value — a mega-cluster of
    * identical hashes contributes exactly one row per chunk. Callers
    * expand to members ([[collapsedPairs]]) or keep group granularity
    * ([[sparseEdges]], the store probes). */
  private[graft] def distinctHashPairs(hashes: DataFrame, hashCol: String,
                                       bits: Int, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < bits, s"maxDist=$maxDist out of range")
    require(bits >= 1 && bits <= 64, s"bits=$bits out of range")
    val keyed = bandKeys(hashes.select(col(hashCol)).distinct(),
      hashCol, bits, maxDist)
    val l = keyed.select(col(hashCol).as("__ha"), col("chunk"),
      col("chunk_val"))
    val r = keyed.select(col(hashCol).as("__hb"), col("chunk"),
      col("chunk_val"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("__ha") < col("__hb"))
      .select("__ha", "__hb").distinct()
      .withColumn("__hd", expr("bit_count(__ha ^ __hb)").cast("long"))
      .filter(col("__hd") <= maxDist)
  }

  /** The exact all-pairs contract — (id_a, id_b, hamming) with
    * id_a < id_b for every pair within maxDist — computed with the
    * identical-hash collapse: cross-group pairs expand the distinct-
    * hash pairs to their members (each emitted row IS an output row),
    * within-group pairs are a plain equi-self-join on the hash value
    * at distance 0 (again exactly output-sized). Output equals the
    * uncollapsed banded join's by the pigeonhole completeness at
    * group level; the intermediate no longer carries the
    * O(m² · chunks) mega-bucket blowup.
    *
    * `hashed` must be (idCol, hashCol) with unique ids; callers with an
    * expensive hash kernel (media decode) should localCheckpoint it —
    * the frame is consumed three times (distinct, cross expansion ×2,
    * within self-join). */
  private[graft] def collapsedPairs(hashed: DataFrame, idCol: String,
                                    hashCol: String, bits: Int,
                                    maxDist: Int): DataFrame = {
    val hp = distinctHashPairs(hashed, hashCol, bits, maxDist)
    val ma = hashed.select(col(idCol).as("__ida"), col(hashCol).as("__ha"))
    val mb = hashed.select(col(idCol).as("__idb"), col(hashCol).as("__hb"))
    val cross = hp.join(ma, Seq("__ha")).join(mb, Seq("__hb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        col("__hd").as("hamming"))
    val within = ma
      .join(mb, col("__ha") === col("__hb") && col("__ida") < col("__idb"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        lit(0L).as("hamming"))
    cross.unionByName(within)
  }

  /** A CONNECTIVITY-equivalent sparse edge set — (id_a, id_b) — for
    * connected-components consumers: one star edge per non-
    * representative member (group-min id ↔ member, distance 0) plus
    * one edge per near-dup pair of distinct hash values (their group
    * mins). Same components and therefore identical min-label CC
    * output as the full all-pairs graph (every full edge is within one
    * star/rep hop; every sparse edge is a real ≤maxDist pair), but the
    * edge count is linear in corpus + distinct-hash candidates instead
    * of quadratic in duplicate-cluster size — the form
    * [[graft.operators.Multimodal.phashDedupClusters]] feeds to CC. */
  private[graft] def sparseEdges(hashed: DataFrame, idCol: String,
                                 hashCol: String, bits: Int,
                                 maxDist: Int): DataFrame = {
    val groups = hashed.groupBy(col(hashCol))
      .agg(min(col(idCol)).as("__rep"))
    val star = hashed.join(groups, Seq(hashCol))
      .filter(col(idCol) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(idCol).as("id_b"))
    val ga = groups.select(col(hashCol).as("__ha"), col("__rep").as("__ra"))
    val gb = groups.select(col(hashCol).as("__hb"), col("__rep").as("__rb"))
    val repEdges = distinctHashPairs(hashed, hashCol, bits, maxDist)
      .join(ga, Seq("__ha")).join(gb, Seq("__hb"))
      .select(least(col("__ra"), col("__rb")).as("id_a"),
        greatest(col("__ra"), col("__rb")).as("id_b"))
    star.unionByName(repEdges)
  }

  /** Collapse a hash table to group granularity: one row per distinct
    * hash value with the group's min id and member count — the exact
    * sufficient statistic for every store-probe aggregate
    * (min-matching-id inherits through group mins because a group's
    * members all match or none do; distinct-match counts sum because
    * groups partition the ids). */
  private[graft] def hashGroups(hashed: DataFrame, idCol: String,
                                hashCol: String): DataFrame =
    hashed.groupBy(col(hashCol))
      .agg(min(col(idCol)).as("__gmin"),
        count(lit(1)).as("__gn"))

  /** One incremental-dedup serve of a hashed batch against a frozen
    * hash store — the lens-agnostic core of
    * [[graft.operators.Multimodal.servePhashDedup]] (extracted round
    * 19 so the SimHash text store shares one implementation instead of
    * duplicating 60 lines of subtle probe logic; the phash oracles
    * q185-q190 certify the extraction unchanged).
    *
    * Semantics: each batch row reports `dup_of` = the smallest
    * matching store id with HISTORY WINNING over within-batch matches
    * of any id (the curated copy is already stored — the Curation
    * keeper convention), within-batch min-id otherwise; `is_fresh`
    * when no match at all. Both sides ride the identical-hash collapse
    * ([[hashGroups]]): a group's members all match a hash or none do,
    * so min-matching-id inherits through group mins, and per-member
    * results join back at the end — a duplicate-heavy batch or store
    * (the blank-thumbnail / boilerplate-text regime) costs the same
    * join as a distinct one.
    *
    * The BATCH side broadcasts, pinned: the store's band expansion is
    * corpus-sized and must stream past the probe (local-mode AQE
    * happily broadcasts the tiny test store — at 100 TB that plan
    * inverts into a per-serve store shuffle, the q173 lesson).
    *
    * `store` is (idCol, hashCol [, extras]) already redelivery-fenced
    * by the caller; `bh` is (idCol, hashCol) with unique ids, ideally
    * localCheckpointed (it feeds the group cut AND the output join). */
  private[graft] def serveDedupCore(store: DataFrame, bh: DataFrame,
                                    idCol: String, hashCol: String,
                                    bits: Int, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < bits, s"maxDist=$maxDist out of range")
    val bg = hashGroups(bh, idCol, hashCol)
      .localCheckpoint(eager = true) // banded twice + the member join
    val bb = groupBandKeys(bg.select(col(hashCol)), hashCol, bits, maxDist)
    val hg = hashGroups(store, idCol, hashCol)
    val hist = groupBandKeys(hg, hashCol, bits, maxDist)
      .select(col("chunk"), col("chunk_val"),
        col(hashCol).as("__hh"), col("__gmin").as("__hmin"))
    val histDup = broadcast(bb).join(hist, Seq("chunk", "chunk_val"))
      .select(col(hashCol), col("__hh"), col("__hmin")).distinct()
      .filter(expr(s"bit_count($hashCol ^ __hh) <= $maxDist"))
      .groupBy(col(hashCol))
      .agg(min(col("__hmin")).as("__hdup"))
    // within-batch: min over the group mins of every batch group within
    // maxDist (INCLUDING the group itself at distance 0). For member x
    // the original per-id min over peers {p < x} is then: __m1 when
    // __m1 < x, else nothing — because __m1 is the global min of x's
    // matching groups, and any smaller matching peer would have dragged
    // its own group min (and so __m1) below it.
    val peer = groupBandKeys(bg, hashCol, bits, maxDist)
      .select(col("chunk"), col("chunk_val"),
        col(hashCol).as("__ph"), col("__gmin").as("__pmin"))
    val batchDup = bb.join(peer, Seq("chunk", "chunk_val"))
      .select(col(hashCol), col("__ph"), col("__pmin")).distinct()
      .filter(expr(s"bit_count($hashCol ^ __ph) <= $maxDist"))
      .groupBy(col(hashCol))
      .agg(min(col("__pmin")).as("__m1"))
    bh
      .join(histDup, Seq(hashCol), "left")
      .join(batchDup, Seq(hashCol), "left")
      .select(col(idCol),
        coalesce(col("__hdup"),
          when(col("__m1") < col(idCol), col("__m1"))).as("dup_of"))
      .select(col(idCol), col("dup_of"),
        col("dup_of").isNull.as("is_fresh"))
  }

  /** Contamination report of a hashed batch against a persisted
    * benchmark (eval) hash store — the lens-agnostic core of
    * [[graft.operators.Multimodal.phashLeaks]] (extracted round 19,
    * shared with the SimHash text lens: [[graft.operators.TextOps
    * .simhashLeaks]]). Every batch row within `maxDist` of ANY stored
    * hash is flagged with its CLOSEST eval match — min (hamming,
    * eval id), deterministic — and the count of distinct eval ids it
    * leaks. Within-batch matches deliberately not consulted:
    * contamination is a property of the batch-vs-benchmark relation
    * only. Identical-hash collapse on both sides: the eval index
    * collapses to (hash, min eval id, distinct eval ids) — a group's
    * members all leak to a batch hash or none do, so the closest-match
    * struct inherits the group min (members share the group's
    * distance) and the distinct-match count SUMS because hash groups
    * partition the eval ids. Batch side broadcasts, pinned; the store
    * streams. Output: (idCol, eval_id, hamming, n_eval_matches), one
    * row per leaking batch id. */
  private[graft] def leaksCore(store: DataFrame, bh: DataFrame,
                               idCol: String, hashCol: String,
                               bits: Int, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < bits, s"maxDist=$maxDist out of range")
    val bb = groupBandKeys(
      bh.select(col(hashCol)).distinct(), hashCol, bits, maxDist)
    val hg = store.groupBy(col(hashCol))
      .agg(min(col(idCol)).as("__emin"),
        countDistinct(col(idCol)).as("__ne"))
    val hist = groupBandKeys(hg, hashCol, bits, maxDist)
      .select(col("chunk"), col("chunk_val"), col(hashCol).as("__eh"),
        col("__emin"), col("__ne"))
    val grpMatch = broadcast(bb).join(hist, Seq("chunk", "chunk_val"))
      .select(col(hashCol), col("__eh"), col("__emin"), col("__ne"))
      .distinct()
      .withColumn("__hd",
        expr(s"CAST(bit_count($hashCol ^ __eh) AS BIGINT)"))
      .filter(col("__hd") <= maxDist)
      .groupBy(col(hashCol))
      .agg(min(struct(col("__hd").as("h"), col("__emin").as("e"))).as("__m"),
        sum(col("__ne")).as("n_eval_matches"))
    bh.join(grpMatch, Seq(hashCol))
      .select(col(idCol), col("__m.e").as("eval_id"),
        col("__m.h").as("hamming"), col("n_eval_matches"))
  }

  /** Band keys over a group-collapsed frame, carrying the group
    * columns through the chunk explode (the store-probe access path:
    * the probe side equi-joins these on (chunk, chunk_val)). */
  private[graft] def groupBandKeys(groups: DataFrame, hashCol: String,
                                   bits: Int, maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val cw = bits / nChunks
    val chunks = (0 until nChunks).map { c =>
      val b = if (c == nChunks - 1) bits - c * cw else cw
      val mask = if (b == 64) -1L else (1L << b) - 1
      struct(lit(c).as("chunk"),
        shiftright(col(hashCol), c * cw).bitwiseAND(lit(mask))
          .as("chunk_val"))
    }
    val carried = groups.columns.map(col)
    groups
      .select(carried :+ explode(array(chunks: _*)).as("__ck"): _*)
      .select(carried :+ col("__ck.chunk").as("chunk")
        :+ col("__ck.chunk_val").as("chunk_val"): _*)
  }
}
