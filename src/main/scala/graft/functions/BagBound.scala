package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression: the BAG (multiset) lower bound on edit
  * distance between two character histograms —
  * `max(Σ max(0, aᵢ−bᵢ), Σ max(0, bᵢ−aᵢ))`.
  *
  * Every unmatched character needs at least one edit, so `ed(a, b) ≥
  * bag_bound(hist(a), hist(b))` (the standard q-gram/bag filter for
  * string-similarity joins); histograms over a SUBSET of the alphabet
  * stay valid bounds. Used by [[graft.llm.Dedup.editDistance]] to
  * discard candidate pairs before the O(len·τ) banded DP.
  *
  * Why a custom expression (SURVEY §3 ladder step b): the same formula
  * via `zip_with`+`aggregate` runs INTERPRETED — per-row lambda
  * dispatch and array allocation made the filter cost as much as the
  * DP it replaced. Here it is one fused int loop inside whole-stage
  * codegen.
  */
case class BagBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bag_bound"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ins = 0; var del = 0
    var i = 0
    while (i < n) {
      // null slots contribute nothing (treated as 0 on both sides)
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getInt(i) - y.getInt(i)
        if (d > 0) ins += d else del -= d
      }
      i += 1
    }
    math.max(ins, del)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ins = ctx.freshName("ins")
      val del = ctx.freshName("del")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $ins = 0, $del = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    int d = $x.getInt($i) - $y.getInt($i);
         |    if (d > 0) $ins += d; else $del -= d;
         |  }
         |}
         |${ev.value} = java.lang.Math.max($ins, $del);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BagBound =
    copy(left = newLeft, right = newRight)
}
