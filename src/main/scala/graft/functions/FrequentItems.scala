package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitter summary over a long item column — the
  * bounded-memory frequent-items sketch (k counters regardless of key
  * cardinality). Guarantee: every item with true frequency > n/(k+1)
  * is in the output, and each reported estimate undercounts by at most
  * n/(k+1). Mergeable (counter sums re-compressed to k), so partial
  * aggregation applies — at 100 TB the shuffle carries k counters per
  * map task instead of every distinct key, and a cheap exact second
  * pass over the (tiny) candidate set turns the sketch into EXACT
  * heavy hitters (see Telemetry.heavyHitters).
  *
  * Output: array<struct<item: long, est: long>>, sorted (est desc,
  * item asc) for deterministic presentation; estimates are
  * order-dependent (any MG summary is), the candidate SET guarantee is
  * what downstream relies on. */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, s"frequent_items k must be positive, got $k")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.contains(x)) buf(x) += 1L
      else if (buf.size < k) buf(x) = 1L
      else {
        // decrement-all step; drop zeroed counters
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (key, c) =>
          if (c == 1L) dead += key else buf(key) = c - 1L
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Counter sums, re-compressed to k by subtracting the (k+1)-largest
    * combined count (the standard MG merge — error bounds add). */
  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (key, c) => buf(key) = buf.getOrElse(key, 0L) + c }
    if (buf.size > k) {
      val counts = buf.values.toArray.sorted(Ordering.Long.reverse)
      val cut = counts(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (key, c) =>
        if (c - cut <= 0L) dead += key else buf(key) = c - cut
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) => InternalRow(item, est) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (key, c) => out.writeLong(key); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(in.readLong()) = in.readLong(); i += 1 }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frequent_items requires a BIGINT item column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType, nullable = false),
                   StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "frequent_items"

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(child = newChildren.head)
}
