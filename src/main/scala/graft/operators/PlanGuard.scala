package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan shape guards for operators whose CORRECTNESS leans on a
  * specific lowering, not just on the declared semantics. */
object PlanGuard {

  /** Append `srank` = 1-based row position to an `orderBy(...).limit(k)`
    * frame. The id trick is only correct when the plan lowers to
    * TakeOrderedAndProject — ONE ordered output partition (partition id
    * 0), where monotonically_increasing_id counts 0,1,2,… in sort order
    * with no second sort stage and no unpartitioned window. If the limit
    * ever exceeds spark.sql.execution.topKSortFallbackThreshold, or a
    * Spark upgrade/AQE change re-lowers the sort, ids become
    * partition-encoded garbage — so this FAILS the query instead of
    * silently mis-ranking (round-8 advice). Planning here is free to the
    * caller: queryExecution is a lazy val on the returned Dataset, shared
    * with whoever materializes it. */
  def positionRank(ordered: DataFrame): DataFrame = {
    val out = ordered
      .withColumn("srank", (monotonically_increasing_id() + 1).cast("long"))
    // executedPlan may be an AdaptiveSparkPlanExec whose initial plan is
    // not in `children`, so string-match the rendered tree (same approach
    // as ScaleGuardSpec's join-shape assertions)
    require(out.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "positionRank requires an orderBy().limit() that lowers to " +
        "TakeOrderedAndProject; the plan re-lowered (limit above " +
        "topKSortFallbackThreshold, or a Spark planning change) and " +
        "monotonically_increasing_id ranks would be partition-encoded")
    out
  }
}
