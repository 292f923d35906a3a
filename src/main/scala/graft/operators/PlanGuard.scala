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
  /** Cap for driver-side METADATA collects (segment/partition
    * descriptors in the maintenance operators). These frames are
    * aggregated to one row per segment BEFORE collecting, so the bound
    * is #segments — ~10⁵ at a 100 TB topic, far under this cap — but an
    * accidental pre-aggregation regression (or a pathological layout)
    * must fail fast with a pointer, not OOM the driver. */
  val MaxDriverMetaRows: Int = 1 << 20

  /** Collect a driver-side metadata frame with an explicit row cap:
    * `take(cap+1)` pulls at most cap+1 rows (never the full overflow),
    * then the guard refuses. The frame must stay segment/partition-
    * bounded — never record-bounded. */
  def boundedCollect(df: DataFrame, what: String,
                     cap: Int = MaxDriverMetaRows):
      Array[org.apache.spark.sql.Row] = {
    val rows = df.take(cap + 1)
    require(rows.length <= cap,
      s"$what: driver-side metadata collect exceeded $cap rows — this " +
        "frame must be aggregated to segment/partition granularity " +
        "before collecting (narrow the maintenance scope per " +
        "topic/partition, or page over partitions)")
    rows
  }

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
