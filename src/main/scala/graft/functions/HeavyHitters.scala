package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native mergeable aggregate —
  * the "novel sketch as a custom aggregate" slot of the engine's
  * extension ladder (scalar kernels are Expressions; grouped sketches
  * are TypedImperativeAggregates).
  *
  * The classic frequent-items summary: at most `capacity` = k−1
  * counters; an unseen item either claims a free counter or decrements
  * every counter (dropping zeros). The sketch GUARANTEES every item
  * with true frequency > n/k survives, with count underestimated by at
  * most n/k (Misra & Gries 1982). Merging follows Agarwal et al.
  * "Mergeable Summaries": sum counter maps, then subtract the
  * (capacity+1)-largest count and drop non-positive — the error bound
  * is preserved under ARBITRARY merge trees, which is exactly what a
  * partial-aggregate plan does: map-side sketches per partition, one
  * reduce-side merge per group. Constant memory per group at any
  * corpus size; the exact alternative shuffles every distinct item.
  *
  * Output: array<struct<item, est>> sorted by (est desc, item asc) —
  * deterministic for a given merge tree; counts are estimates (audit
  * queries should assert the COMPLETENESS guarantee, not count
  * equality — see q65).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, s"capacity=$capacity must be >= 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        // decrement-all: drains one "vote" from every tracked item in
        // lieu of tracking this one; amortized O(1) per input because
        // each decrement cancels a previous increment
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-largest count from everything — the
      // mergeable-summaries reduction that restores the size bound
      // while keeping total undercount <= n/k
      val cut = b1.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1 < i2
    }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object HeavyHittersFunctions {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("heavy_hitters"))) return
    reg.createOrReplaceTempFunction("heavy_hitters",
      es => MisraGriesAgg(es(0), intArg(es(1))).toAggregateExpression(),
      "scala_udf")
  }

  /** `heavy_hitters(item, k)`: Misra-Gries summary with k−1 counters —
    * every item with frequency > n/k in the group is guaranteed
    * present. */
  def heavyHitters(item: Column, k: Int): Column = {
    require(k >= 2, s"k=$k must be >= 2")
    call_function("heavy_hitters", item, lit(k - 1))
  }
}
