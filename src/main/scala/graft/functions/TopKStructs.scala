package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k: keep the k LARGEST struct values under the
  * struct's natural (lexicographic) ordering, returned in descending
  * order.
  *
  * This is the scale-path alternative to `row_number() OVER (...) <= k`:
  * a window function sorts every partition's full row set (O(n log n)
  * per key group and a sort of the whole shuffle output), while this
  * aggregate keeps a k-element buffer per key with map-side partial
  * aggregation — the shuffle carries at most k rows per key per map
  * task, never the raw rows. Same extension-ladder rung as
  * [[BottomKByHash]] (TypedImperativeAggregate sketch).
  *
  * Ordering direction is encoded by the caller in the struct fields
  * (negate a numeric field for "smallest wins" on that component), so
  * one aggregate covers every (ORDER BY a DESC, b ASC, ...) shape.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty[InternalRow]

  /** Sort descending, trim to k. Amortized: only invoked when the buffer
    * reaches 2k, so each input row costs O(log k) amortized. */
  private def compact(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length > k) {
      val sorted = buf.sortWith((a, b) => ordering.compare(a, b) > 0)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[InternalRow].copy()
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[InternalRow], other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(
      buf.sortWith((a, b) => ordering.compare(a, b) > 0).take(k).toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { row =>
      val unsafe = toUnsafe(row)
      val bytes = unsafe.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k_structs"

  override def withNewMutableAggBufferOffset(offset: Int): TopKStructs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKStructs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
}
