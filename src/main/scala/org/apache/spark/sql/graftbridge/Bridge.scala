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

  /** Ids of the cached column-buffer RDDs backing `df`'s plan (one per
    * InMemoryRelation in the optimized plan). A PER-ENTRY observable for
    * cache-eviction tests: global persistent-RDD counts race with
    * unrelated suites unpersisting in the same SparkContext, and
    * Dataset.storageLevel resolves through the CacheManager by canonical
    * plan — which cannot tell a stale entry from its same-plan
    * replacement. */
  def cachedRddIds(df: DataFrame): Set[Int] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cacheBuilder.cachedColumnBuffers.id
    }.toSet

  /** One-time quiet of the RDD-class "locally checkpointed … cannot be
    * recomputed after unpersisting" WARN: it fires on EVERY unpersist of
    * a local checkpoint, intentional or not, so as a log line it carries
    * no signal and camouflages real warnings in bench stderr. The actual
    * failure mode of an out-of-order release is a hard SparkException
    * ("Checkpoint block … not found") at the late consumer — pinned by
    * CacheEvictionSpec — never a silent recompute. */
  private lazy val quietLineageWarn: Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)

  /** Unpersist the block storage behind a `localCheckpoint()`ed frame.
    * Caller contract: every consumer of `df` is already materialized —
    * after release the frame is NOT recomputable (truncated lineage). */
  def releaseCheckpointStorage(df: DataFrame,
                               blocking: Boolean = false): Unit = {
    quietLineageWarn
    checkpointRdd(df).foreach(_.unpersist(blocking))
  }

  /** Drain the async listener bus so SparkListener-accumulated metrics
    * (e.g. per-batch inputMetrics.bytesRead in BenchGateCold) are
    * complete before the caller reads them. `waitUntilEmpty` is
    * private[spark] — hence this bridge accessor. */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
