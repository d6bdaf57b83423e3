package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Shared DDSketch kernel (Masson et al. VLDB'19) on the integer-exact
  * √2 grid — used by both the native aggregate [[DdsketchAgg]] and the
  * streaming twin [[graft.streaming.StreamingDdsketch]], and the same
  * math as the relational query [[graft.telemetry.Telemetry.ddsketch]]
  * (one oracle checks all three). */
object DdsketchKernel {

  /** `isqrt(2^(2f+1))` for f = 0..62: the largest v with v² ≤ 2^(2f+1).
    * Exact (BigInteger.sqrt), computed once — lets [[bucketIdx]] decide
    * ⌈log2 v²⌉ without ever forming v², so the index is correct for the
    * whole int64 grid instead of silently wrapping past v ≈ 3.04e9. */
  private val halfOctave: Array[Long] = Array.tabulate(63) { f =>
    java.math.BigInteger.ONE.shiftLeft(2 * f + 1).sqrt().longValueExact()
  }

  /** Largest value whose centi-unit grid point fits int64 (Long.Max/100,
    * floored to a round bound). Beyond it the grid itself is undefined. */
  val MaxValue: Double = 9.0e16

  /** ⌈log_√2 v100⌉ = ⌈log2 v100²⌉ on the centi-unit grid, WITHOUT
    * squaring: with f = ⌊log2 v⌋, the index is 2f when v is a power of
    * two, else 2f+1 while v ≤ isqrt(2^(2f+1)) and 2f+2 above — exact
    * for every v100 in int64 (the squared form bits(v²−1) wraps for
    * v ≥ ~3.04e9, i.e. values ≥ ~3e7, and silently lands in bucket 64).
    * Values past the grid itself (v100 beyond int64) are a hard error,
    * not a wrong bucket. The quantization is BigDecimal HALF_UP — the
    * identical op Spark's `round(value*100, 0)` performs row-side, so
    * the native and relational paths bucket every value the same way (a
    * `floor(x+0.5)` shortcut would diverge on the 0.49999999999999994
    * pathology). */
  def bucketIdx(value: Double): Long = {
    require(value <= MaxValue,
      s"ddsketch: value $value exceeds the centi-unit grid's int64 range " +
        s"(max ${MaxValue}); rescale the series before sketching")
    val v100 = math.max(
      BigDecimal(value * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
      1L)
    if (v100 == 1) 0L
    else {
      val f = 63 - java.lang.Long.numberOfLeadingZeros(v100)
      if ((v100 & (v100 - 1)) == 0L) 2L * f
      else if (v100 <= halfOctave(f)) 2L * f + 1
      else 2L * f + 2
    }
  }

  final case class Summary(n: Long, nBucketsRaw: Long, nBucketsKept: Long,
                           collapsedN: Long, p50: Double, p95: Double,
                           p99: Double, maxIdx: Long)

  /** Collapse to ≤ m buckets + midpoint quantile read-out — integer
    * pow, then sqrt/add/divide (all IEEE correctly-rounded) and one
    * 4-decimal HALF_UP round: the identical op sequence as the SQL
    * expression `round(2*sqrt(pow(2,i))/(1+sqrt(2))/100, 4)`. */
  def readOut(bm: collection.Map[Long, Long], m: Int): Summary = {
    val gamma1 = 1.0 + math.sqrt(2.0)
    val sortedDesc = bm.keys.toSeq.sorted.reverse
    val cutoff = sortedDesc.take(m).min
    val collapsedN = sortedDesc.drop(m).map(bm).sum
    val kept = bm.groupBy { case (i, _) => math.max(i, cutoff) }
      .map { case (ki, e) => ki -> e.values.sum }
    val n = kept.values.sum
    val asc = kept.toSeq.sortBy(_._1)
    def est(rank: Long): Double = {
      var cum = 0L
      var out = Double.NaN
      asc.foreach { case (ki, c) =>
        val prev = cum; cum += c
        if (out.isNaN && cum >= rank && prev < rank)
          out = BigDecimal(
            2.0 * math.sqrt(math.pow(2.0, ki.toDouble)) / gamma1 / 100.0)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      out
    }
    Summary(n, bm.size.toLong, kept.size.toLong, collapsedN,
      est(math.ceil(0.50 * n).toLong), est(math.ceil(0.95 * n).toLong),
      est(math.ceil(0.99 * n).toLong), asc.last._1)
  }
}

/** Native DDSketch aggregate over a positive double column:
  * `ddsketch_agg(value, m)` → struct summary. The buffer is the bucket
  * map itself (≤ ~64 longs for any data volume), `merge` is key-wise
  * counter addition — the fully-mergeable property the paper names in
  * its title, which is exactly Spark's partial-aggregation contract:
  * at 100 TB every map task ships one ≤64-entry map instead of its
  * rows, and AQE/partial-agg apply with no planner help.
  *
  * vs the relational [[graft.telemetry.Telemetry.ddsketch]]: same
  * buckets, same collapse, same read-out (shared [[DdsketchKernel]]),
  * one shuffle of maps instead of (key, idx) rows — the win is one
  * aggregation pass with no post-agg window phase. Both hash-check
  * against the same DuckDB oracle. */
case class DdsketchAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(m > 0, s"ddsketch_agg m must be positive, got $m")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x > 0) {
        val i = DdsketchKernel.bucketIdx(x)
        buf(i) = buf.getOrElse(i, 0L) + 1L
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (key, c) => buf(key) = buf.getOrElse(key, 0L) + c }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val s = DdsketchKernel.readOut(buf, m)
    InternalRow(s.n, s.nBucketsRaw, s.nBucketsKept, s.collapsedN,
      s.p50, s.p95, s.p99, s.maxIdx)
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
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ddsketch_agg requires a DOUBLE value column, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_buckets_raw", LongType, nullable = false),
    StructField("n_buckets_kept", LongType, nullable = false),
    StructField("collapsed_n", LongType, nullable = false),
    StructField("p50_est", DoubleType, nullable = false),
    StructField("p95_est", DoubleType, nullable = false),
    StructField("p99_est", DoubleType, nullable = false),
    StructField("max_idx", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "ddsketch_agg"

  override def withNewMutableAggBufferOffset(offset: Int): DdsketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DdsketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdsketchAgg =
    copy(child = newChildren.head)
}
