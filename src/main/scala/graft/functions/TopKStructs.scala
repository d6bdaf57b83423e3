package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k over struct values.
  *
  * Semantics: keep the k FIRST struct values under the configured sort
  * order, returned in that order. The sort order compares the first
  * `ascending.length` struct fields with the given per-field direction
  * and null placement; remaining fields are payload (never compared —
  * ties among them are resolved arbitrarily, exactly like
  * `row_number()` on tied keys). With `ascending` empty (the 2-arg SQL
  * function `top_k_structs(struct, k)`), every field is compared
  * descending with nulls last — "k largest, largest first".
  *
  * This is the scale-path alternative to `row_number() OVER (...) <= k`:
  * a window function sorts every partition's full row set and shuffles
  * every raw row, while this aggregate keeps a k-element buffer per key
  * with map-side partial aggregation — the shuffle carries at most k
  * rows per key per map task. Same extension-ladder rung as
  * [[BottomKByHash]] (TypedImperativeAggregate sketch); the
  * [[graft.plans.TopKWindowRewrite]] optimizer rule targets it.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    ascending: Seq[Boolean] = Nil,
    nullsFirst: Seq[Boolean] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(ascending.isEmpty || nullsFirst.length == ascending.length,
    s"nullsFirst (${nullsFirst.length}) must match ascending (${ascending.length})")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val fieldTypes: Array[DataType] =
    structType.fields.map(_.dataType)

  @transient private lazy val nCompare: Int =
    if (ascending.isEmpty) fieldTypes.length else ascending.length

  // Orderings only for the compared prefix: payload fields may be
  // unorderable (MapType attrs etc.) and are never compared.
  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    fieldTypes.take(nCompare).map(TypeUtils.getInterpretedOrdering)

  @transient private lazy val asc: Array[Boolean] =
    if (ascending.isEmpty) Array.fill(fieldTypes.length)(false) else ascending.toArray

  @transient private lazy val nFirst: Array[Boolean] =
    if (ascending.isEmpty) Array.fill(fieldTypes.length)(false) else nullsFirst.toArray

  /** SQL ORDER BY comparison over the leading fields. */
  private def lessThan(a: InternalRow, b: InternalRow): Boolean = {
    var i = 0
    while (i < nCompare) {
      val av = a.get(i, fieldTypes(i))
      val bv = b.get(i, fieldTypes(i))
      val c =
        if (av == null && bv == null) 0
        else if (av == null) { if (nFirst(i)) -1 else 1 }
        else if (bv == null) { if (nFirst(i)) 1 else -1 }
        else {
          val n = fieldOrds(i).compare(av, bv)
          if (asc(i)) n else -n
        }
      if (c != 0) return c < 0
      i += 1
    }
    false
  }

  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty[InternalRow]

  /** Sort by the configured order, trim to k. Amortized: only invoked
    * when the buffer reaches 2k, so each row costs O(log k) amortized. */
  private def compact(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(lessThan)
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
    new GenericArrayData(buf.sortWith(lessThan).take(k).toArray[Any])

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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case st: StructType =>
        val cmp = if (ascending.isEmpty) st.fields.length else ascending.length
        if (cmp > st.fields.length)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"top_k_structs: $cmp sort directions but only ${st.fields.length} struct fields")
        else {
          val bad = st.fields.take(cmp).filterNot(f =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
          if (bad.isEmpty)
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          else
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"top_k_structs: unorderable sort field(s) ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
        }
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_structs requires a struct input, got ${other.simpleString}")
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
