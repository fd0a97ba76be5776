package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** The one `private[sql]` doorway a custom operator library needs:
  * wrap a hand-built [[LogicalPlan]] as a DataFrame. Spark extension
  * libraries conventionally place this shim inside the
  * `org.apache.spark.sql` namespace — everything else in graft.plans
  * uses developer-API surfaces (SparkStrategy, BinaryExecNode,
  * experimental.extraStrategies). */
object PlanShim {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(s.asInstanceOf[CSparkSession], plan)
}
