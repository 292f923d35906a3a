package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB answer for repeated big
  * fact⋈fact joins: both sides bucketed on the join key means zero
  * Exchange at query time (the shuffle was paid once at write time). */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join with no shuffle exchange") {
    import spark.implicits._
    graft.sources.Tables.load(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    graft.sources.Tables.load(spark, sf, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the plan must prove bucket co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          $"o_custkey" === $"c_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        "orders side was shuffled despite bucketing:\n" + plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        "customer side was shuffled despite bucketing:\n" + plan.take(1500))
      // and the answer matches the unbucketed join
      val expected = graft.sources.Tables.load(spark, sf, "orders")
        .join(graft.sources.Tables.load(spark, sf, "customer"),
          $"o_custkey" === $"c_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
