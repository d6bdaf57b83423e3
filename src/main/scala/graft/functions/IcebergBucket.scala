package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.IcebergPartitioning

/** `iceberg_bucket(n, col)` — the Iceberg table-spec `bucket[N]`
  * partition transform (Appendix B murmur3_x86_32, `(hash & maxInt)
  * % N`) as a native codegen'd expression, so bucket-clustering a
  * corpus is ONE shuffle on the computed value instead of the
  * distinct+join+repartition detour a driver-side kernel forces.
  * The reference stack registers `bucket[N]` specs through its
  * catalog (`/root/reference/internal/iceberg/catalog_rest.go:527`
  * parseTransform); this is the write-path twin that routes rows to
  * spec-exact buckets inside whole-stage codegen.
  *
  * Sources: bigint (int promotes to long, hashed as 8 LE bytes) and
  * string (hashed as UTF-8 bytes, no String round-trip in the
  * generated code). NULL source → NULL bucket, so callers can route
  * null keys to a null partition tuple instead of dropping them.
  * The shared JVM kernel ([[IcebergPartitioning.bucketValue]]) is the
  * one `PropertySpec` pins against the spec's Appendix-B hash
  * vectors, so the expression inherits spec conformance. */
case class IcebergBucket(numBuckets: Int, child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (numBuckets < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires at least 2 buckets, got $numBuckets")
    else child.dataType match {
      case LongType | IntegerType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports bigint/int/string sources, got " +
          other.simpleString)
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "iceberg_bucket"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType =>
      IcebergPartitioning.bucketValue(numBuckets, v.asInstanceOf[Long])
    case IntegerType =>
      IcebergPartitioning.bucketValue(numBuckets, v.asInstanceOf[Int].toLong)
    case StringType =>
      IcebergPartitioning.bucketValueUtf8(
        numBuckets, v.asInstanceOf[UTF8String].getBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.catalog.IcebergPartitioning"
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, v => s"$kernel.bucketValue($numBuckets, $v)")
      case IntegerType =>
        defineCodeGen(ctx, ev,
          v => s"$kernel.bucketValue($numBuckets, (long)$v)")
      case StringType =>
        defineCodeGen(ctx, ev,
          v => s"$kernel.bucketValueUtf8($numBuckets, $v.getBytes())")
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcebergBucket = copy(child = newChild)
}
