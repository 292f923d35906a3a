package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal accessor for `private[sql]` plan↔Dataset plumbing.
  *
  * Building a DataFrame from a custom [[LogicalPlan]] node (the supported
  * extension route — `Dataset.ofRows`) is `private[sql]`, so this one-file
  * bridge lives inside the `org.apache.spark.sql` namespace. Nothing else
  * in the repo reaches into Spark internals this way.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (classic API). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
