package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** Minimal bridge into `private[sql]` plan construction — the standard
  * shim every SparkSessionExtensions-based library uses to hand a
  * custom LogicalPlan (here [[graft.plans.AsOfJoinNode]]) back to the
  * public DataFrame API. Nothing else from the internal surface is
  * exposed. */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
