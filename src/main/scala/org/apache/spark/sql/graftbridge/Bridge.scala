package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column<->Expression bridging and plan<->Dataset plumbing
  * private[sql] (classic.ExpressionUtils / classic.Dataset.ofRows). This
  * subpackage object re-exports the conversions graft's custom Catalyst
  * expressions and plan nodes need — the standard extension-library
  * pattern (same trick frameless/delta use) and the only place graft
  * reaches into Spark internals. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a (possibly custom) logical plan node. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (classic API). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** The checkpointed RDD behind a `localCheckpoint()`ed DataFrame, if
    * that is what `df` is. `Dataset.unpersist` only reaches CacheManager
    * entries; releasing a local checkpoint's storage means unpersisting
    * the underlying RDD, whose LogicalRDD wrapper is private[sql] —
    * hence this bridge accessor. */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    analyzed(df) match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
