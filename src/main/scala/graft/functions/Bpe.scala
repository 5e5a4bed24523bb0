package graft.functions

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair encoding (Sennrich-style BPE, the public
  * algorithm), model-as-table: the merge list is LEARNED from the
  * corpus itself (driver-resident word-frequency dictionary — the
  * k-means-centroid bound class of model state), persisted/joined as
  * an ordinary (rank, left, right) table, and APPLIED per row by a
  * codegen'd expression. Every budget in the curation family can then
  * count BPE tokens — what a real training-data pipeline budgets —
  * instead of whitespace tokens, with the whole derivation replayable
  * by the SQL oracle (an unrolled merge-step chain, the q97/q98
  * discipline for iterative algorithms).
  *
  * Algorithm contract (pinned; both engines implement THIS):
  *  - pre-tokenize: split on single space, drop empty tokens (the
  *    TextOps.tokens convention);
  *  - dictionary: distinct words with corpus frequencies, capped to
  *    the top `maxWords` by (freq DESC, word ASC) — the cap is the
  *    100 TB boundedness guarantee for driver state;
  *  - train: `numMerges` steps; each counts adjacent symbol pairs
  *    weighted by word frequency (overlapping adjacency — "aaa"
  *    carries (a,a) twice), picks the max count with ties toward the
  *    lexicographically smallest (left, right), and applies the merge
  *    to every dict word left-to-right non-overlapping;
  *  - encode: apply the merges to a word's codepoints IN RANK ORDER,
  *    one pass each, same left-to-right rule. For merges learned by
  *    this trainer that equals the classic priority-queue encode:
  *    merge i's pair can only mention symbols produced by merges < i,
  *    so a later merge can never re-enable an earlier one — which is
  *    also why a trained word's final dictionary state IS its
  *    encoding (the law BpeSpec pins and the oracle relies on).
  *
  * Determinism: integer counts, total-ordered ties, fixed application
  * order — bit-reproducible across engines, like the quantized
  * k-means. decode = concatenation (merges only ever glue), so
  * encode/decode round-trips exactly.
  */
object Bpe {

  /** Learn `numMerges` merges from a (word, freq) dictionary.
    * Requires enough adjacent pairs to perform every requested merge
    * (a corpus so small it runs dry deserves a loud error, not a
    * silently shorter model — the oracle unrolls exactly this many
    * steps).
    *
    * Incremental trainer (round-13): the naive loop recounts EVERY
    * pair over the whole dictionary each merge — O(merges·dict·len),
    * fine at the oracle's 32 merges, hopeless at a production
    * tokenizer's 32k (measured ≫ minutes over the 100k-word cap). This
    * implementation is the classic delta form of the SAME algorithm:
    * pair counts live in a map kept current by per-word deltas (only
    * words CONTAINING the chosen pair change at each step — Zipf makes
    * that a tiny fraction of the dict), an inverted pair→word-ids
    * index finds them without scanning, and the argmax comes from an
    * ordered set keyed (count DESC, left ASC, right ASC) — the exact
    * tie order the naive loop's minBy applied. Each merge costs
    * O(Σ len(touched words) · log #pairs) instead of O(dict·len).
    * Output is BIT-IDENTICAL to [[learnReference]] (law in BpeSpec);
    * the SQL oracles are unchanged. */
  def learn(dict: Array[(String, Long)], numMerges: Int): Array[(String, String)] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    val syms = dict.map { case (w, _) =>
      mutable.ArrayBuffer.from[String](w.toCharArray.map(_.toString))
    }
    val freqs = dict.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // count DESC, then (left, right) lexicographic ASC — minBy's order
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c
        else {
          val l = a._2.compareTo(b._2)
          if (l != 0) l else a._3.compareTo(b._3)
        }
      }
    }
    val heap = mutable.TreeSet.empty[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long, wordIdx: Int,
             member: Boolean): Unit = {
      val old = counts.getOrElse(p, 0L)
      val now = old + delta
      if (old != 0L) heap.remove((old, p._1, p._2))
      if (now != 0L) { counts(p) = now; heap.add((now, p._1, p._2)) }
      else counts.remove(p)
      val set = occ.getOrElseUpdate(p, mutable.BitSet.empty)
      if (member) set.add(wordIdx)
      else if (set.remove(wordIdx) && set.isEmpty) occ.remove(p)
    }
    def pairsOf(s: mutable.ArrayBuffer[String]): Seq[((String, String), Long)] = {
      // overlapping adjacency with multiplicity: "aaa" carries (a,a) ×2
      val m = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        m(p) = m.getOrElse(p, 0L) + 1L
        i += 1
      }
      m.toSeq
    }
    var w = 0
    while (w < syms.length) {
      pairsOf(syms(w)).foreach { case (p, mult) =>
        bump(p, mult * freqs(w), w, member = true)
      }
      w += 1
    }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    for (r <- 0 until numMerges) {
      require(counts.nonEmpty,
        s"corpus ran out of adjacent pairs at merge $r of $numMerges")
      val (_, l, rr) = heap.head
      val best = (l, rr)
      out += best
      // only words holding the pair change; snapshot the index entry —
      // bump() mutates it as the word's membership is rebuilt
      val touched = occ.get(best).map(_.toArray).getOrElse(Array.empty)
      var t = 0
      while (t < touched.length) {
        val wi = touched(t)
        val f = freqs(wi)
        pairsOf(syms(wi)).foreach { case (p, mult) =>
          bump(p, -mult * f, wi, member = false)
        }
        syms(wi) = applyMerge(syms(wi), best._1, best._2)
        pairsOf(syms(wi)).foreach { case (p, mult) =>
          bump(p, mult * f, wi, member = true)
        }
        t += 1
      }
    }
    out.toArray
  }

  /** The pre-round-13 trainer, kept VERBATIM as the executable
    * specification [[learn]] is law-checked against (BpeSpec): full
    * recount every merge, argmax by max-count then lexicographic
    * minBy. O(merges·dict·len) — reference only. */
  private[graft] def learnReference(dict: Array[(String, Long)],
                                    numMerges: Int): Array[(String, String)] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    val words = dict.map { case (w, f) =>
      (w.toCharArray.map(_.toString), f)
    }
    val state = mutable.ArrayBuffer.from(words.map { case (s, f) =>
      (mutable.ArrayBuffer.from[String](s), f)
    })
    val out = mutable.ArrayBuffer.empty[(String, String)]
    for (r <- 0 until numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      require(counts.nonEmpty,
        s"corpus ran out of adjacent pairs at merge $r of $numMerges")
      val maxC = counts.valuesIterator.max
      val best = counts.collect { case (p, c) if c == maxC => p }
        .minBy(identity) // (left, right) lexicographic, total order
      out += best
      var i = 0
      while (i < state.length) {
        state(i) = (applyMerge(state(i)._1, best._1, best._2), state(i)._2)
        i += 1
      }
    }
    out.toArray
  }

  private def applyMerge(syms: mutable.ArrayBuffer[String], l: String,
                         r: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2 // left-to-right, non-overlapping
      } else { out += syms(i); i += 1 }
    }
    out
  }

  /** Encode ONE word: merges applied in rank order (≡ priority encode
    * for trained merge lists — see object doc). */
  def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = mutable.ArrayBuffer.from[String](word.toCharArray.map(_.toString))
    var r = 0
    while (r < merges.length && syms.length > 1) {
      syms = applyMerge(syms, merges(r)._1, merges(r)._2)
      r += 1
    }
    syms.toArray
  }

  /** Priority encode: the merge-count-INDEPENDENT form of
    * [[encodeWord]]. Instead of one pass per merge rank (O(merges ·
    * len) per word — ruinous for hapax-heavy corpora under a
    * production 32k-merge model, where the memo can't help), scan the
    * word's adjacent pairs for the lowest-ranked one present, apply
    * that single merge left-to-right, repeat until no pair is a merge:
    * each round removes a symbol, so the cost is O(len²) rank-map
    * probes regardless of model size.
    *
    * Equal to [[encodeWord]] for merge lists produced by [[learn]]
    * (BpeSpec law): merge i's pair only mentions symbols produced by
    * merges < i, so (a) fully applying the lowest present rank can
    * only create pairs of HIGHER rank — the minimum present rank is
    * non-decreasing, visiting exactly the ranks the pass-per-rank form
    * applies non-trivially, and (b) one left-to-right pass removes
    * every occurrence of its pair (a merged symbol never reproduces
    * its own halves). For an arbitrary hand-built merge list the two
    * can differ, which is why the trainer is the only model source. */
  def encodeWordPriority(word: String,
                         rankOf: collection.Map[(String, String), Int],
                         merges: Array[(String, String)]): Array[String] = {
    var syms = mutable.ArrayBuffer.from[String](word.toCharArray.map(_.toString))
    var continue = syms.length > 1
    while (continue) {
      var best = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        syms = applyMerge(syms, merges(best)._1, merges(best)._2)
        continue = syms.length > 1
      }
    }
    syms.toArray
  }

  /** decode ∘ encode = identity (merges only concatenate). */
  def decode(tokens: Array[String]): String = tokens.mkString
}

/** The serializable model a [[BpeTokenCountExpr]] plan carries: the
  * ordered merge list plus a bounded per-executor word→count memo —
  * real corpora repeat words massively (Zipf), so the memo turns the
  * per-row cost into a hash probe per word. The memo is pure speed:
  * entries are a deterministic function of the word, and it clears
  * itself past `CacheCap` rather than growing with the vocabulary. */
final class BpeModel(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val memo =
    new ConcurrentHashMap[String, java.lang.Long]()
  // pair → rank, built once per executor: the priority encode's probe
  // structure. The memo covers the Zipf head; the rank map is what
  // keeps the TAIL (hapax words, where a memo can never hit) at
  // O(len²) instead of O(merges · len) per word — at a production 32k
  // merges that is the difference between a scan-speed map stage and
  // one three orders of magnitude slower (storm in docs/SCALE.md).
  // keep the FIRST rank when a pair appears twice in the merge list
  // (possible when a later merge recreates a symbol an earlier pair
  // produced, e.g. 'abc' derivable both as (a,bc) and (ab,c)): plain
  // .toMap keeps the LAST, which would make encodeWordPriority apply
  // the pair at the wrong priority and diverge from encodeWord's
  // first-match-wins scan — the equality the model's laws rely on
  @transient private lazy val rankOf: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.foldLeft(Map.empty[(String, String), Int]) {
      case (m, (p, i)) => if (m.contains(p)) m else m.updated(p, i)
    }
  private val CacheCap = 1 << 16

  def wordTokenCount(w: String): Long = {
    val hit = memo.get(w)
    if (hit != null) return hit.longValue()
    val n = Bpe.encodeWordPriority(w, rankOf, merges).length.toLong
    if (memo.size < CacheCap) memo.put(w, n)
    n
  }

  /** Whitespace-split `text`, BPE-encode each non-empty word, total
    * token count. Codegen entry point. */
  def tokenCount(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) total += wordTokenCount(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** Per-document BPE token count over a frozen merge model — the
  * serve-path form (the q83 frozen-quantizer discipline): the model is
  * a plan-time constant via `addReferenceObj`, the whole count runs as
  * one static call inside the codegen span, no explode, no shuffle. */
case class BpeTokenCountExpr(child: Expression, model: BpeModel)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override def nullSafeEval(input: Any): Any =
    model.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, "graft.functions.BpeModel")
    defineCodeGen(ctx, ev, c => s"$ref.tokenCount($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Registration + Column API. The merge list travels as a literal
  * array-of-[left,right] argument, unwrapped ONCE at plan construction
  * into the expression's reference model (the TokenSetCountsExpr
  * idiom — no per-row interpretation of the model structure). */
object BpeFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_token_count"))) return
    reg.createOrReplaceTempFunction("bpe_token_count",
      es => BpeTokenCountExpr(es(0), new BpeModel(literalMerges(es(1)))),
      "scala_udf")
  }

  private def literalMerges(e: Expression): Array[(String, String)] =
    e.eval().asInstanceOf[ArrayData].toObjectArray(
        ArrayType(StringType, containsNull = false))
      .map { pair =>
        val a = pair.asInstanceOf[ArrayData]
        (a.getUTF8String(0).toString, a.getUTF8String(1).toString)
      }
}
