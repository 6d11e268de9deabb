package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * The one-file bridge into `private[sql]` plan constructors — the standard
 * move for Spark extension libraries that add whole operators (a custom
 * `LogicalPlan` cannot become a `DataFrame` through any public API).
 * Everything else in graft lives outside the Spark namespace; only the
 * two capabilities below are bridged, both read-only with respect to
 * Spark internals.
 */
object GraftSqlBridge {

  /** Build a DataFrame over a (resolved) custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (attribute-stable). */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
