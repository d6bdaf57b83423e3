package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic consistent sample: the k values with the smallest
  * md5(value) — a mergeable bottom-k sketch (bounded memory per group,
  * partial-aggregable, same sample regardless of partitioning/order).
  *
  * This is the custom-aggregate rung of the extension ladder
  * (SURVEY.md §3): a `TypedImperativeAggregate` with a mutable buffer,
  * the shape used for HLL/sketch aggregates. Values are longs; ties on
  * hash break by value so the result is a total order.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeMap[(String, Long), Unit]] {

  type Buf = scala.collection.mutable.TreeMap[(String, Long), Unit]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.TreeMap.empty[(String, Long), Unit]

  // MessageDigest.digest() resets the instance, so one per aggregate
  // (i.e. per task) is safe to reuse — no per-row allocation.
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  private def md5hex(v: Long): String = {
    val d = md5.digest(v.toString.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  private def add(buf: Buf, v: Long): Buf = {
    buf.update((md5hex(v), v), ())
    while (buf.size > k) buf.remove(buf.lastKey)
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[Long])
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.keysIterator.foreach { case (_, v) => add(buf, v) }
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.keysIterator.map(_._2).toArray.sorted)

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.keysIterator.foreach { case (_, v) => out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => add(buf, in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bottomk_by_hash"

  override def withNewMutableAggBufferOffset(offset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKByHash =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(child = newChildren.head)
}
