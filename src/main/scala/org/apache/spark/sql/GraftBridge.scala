package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to `private[sql]` constructors needed by custom
  * operators (graft.plans.*): building a DataFrame from a hand-built
  * LogicalPlan. Same pattern every Spark extension library uses. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
