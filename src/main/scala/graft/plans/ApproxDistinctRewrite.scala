package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Approximate-query-processing rewrite (extension ladder step (c),
  * like [[TopKWindowRewrite]]): under `spark.graft.approxDistinct
  * .enabled`, every single-column `count(DISTINCT x)` becomes a
  * HyperLogLog++ estimate (2% rsd).
  *
  * Why: exact distinct aggregation expands and shuffles every distinct
  * (group, x) pair — at 100 TB the distinct-key shuffle dwarfs the
  * grouped result. The HLL++ sketch is a few KB per group, merges
  * map-side, and turns that shuffle into sketch bytes. Both return
  * LongType, so the swap is type-transparent; it is OFF by default
  * because it changes answers (estimates), the same contract as any
  * engine's AQP mode.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ENABLED_KEY = "spark.graft.approxDistinct.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ENABLED_KEY, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(Count(children), _, true, _, _)
              if children.length == 1 =>
            ae.copy(
              aggregateFunction =
                HyperLogLogPlusPlus(children.head, relativeSD = 0.02),
              isDistinct = false)
        }
    }
  }
}
