package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k smallest DISTINCT long values (natural signed order) — the
  * KMV (k-minimum-values) sketch primitive, as a mergeable aggregate.
  *
  * This is what an NDV sketch build actually needs: feed it
  * `xxhash64(col)` and the result is bit-identical to
  * `distinct().orderBy(h).limit(k)` — but with NO distinct shuffle.
  * Each partition keeps a bounded TreeSet of ≤k longs (map-side
  * partial aggregation), so at 100 TB on a high-cardinality column at
  * most `k` longs per partition reach the single merge task, instead
  * of shuffling billions of distinct hashes to take the 4096 smallest.
  * KMV is mergeable by construction: the k smallest of a union is the
  * k smallest of the per-part k-smallest.
  *
  * Sibling of [[BottomKByHash]] (which orders by md5-of-value for
  * consistent SAMPLING); this one orders by the value itself because
  * the KMV estimator `(k−1)/x₍ₖ₎` needs the k-th order statistic of
  * the hash distribution. Null inputs are skipped (a null can never be
  * a hash). */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  type Buf = scala.collection.mutable.TreeSet[Long]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.TreeSet.empty[Long]

  private def add(buf: Buf, v: Long): Buf = {
    // cheap reject before the log-n insert: full buffer and v beyond
    // the current k-th smallest can never enter the sketch
    if (buf.size < k || v < buf.last) {
      buf.add(v)
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[Long])
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
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
  override def prettyName: String = "bottomk_distinct"

  override def withNewMutableAggBufferOffset(offset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren.head)
}
