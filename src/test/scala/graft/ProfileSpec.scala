package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Similarity}
import graft.operators.Profile.ColSpec

/** Table profiling + clustering-eval invariants (oracles pin the exact
  * values). */
class ProfileSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("tableProfile: counts nulls/distincts and routes min/max by kind") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (None, Some("a")), (Some(3L), Some("c")))
      .toDF("num_col", "str_col")
    val p = Profile.tableProfile(df,
      Seq(ColSpec("num_col", "num"), ColSpec("str_col", "str")))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = p("num_col")
    assert(n.getLong(1) === 4L)            // n_rows
    assert(n.getLong(2) === 1L)            // n_nulls
    assert(n.getLong(3) === 2L)            // n_distinct (1, 3)
    assert(n.getDouble(4) === 1.0 && n.getDouble(5) === 3.0)
    assert(n.isNullAt(6) && n.isNullAt(7)) // str stats null for numerics
    val s = p("str_col")
    assert(s.getLong(2) === 1L && s.getLong(3) === 3L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "c")
  }

  test("tableProfile edge cases: all-null column, single row") {
    val df = Seq((Some(5L), None: Option[String]))
      .toDF("num_col", "str_col")
      .withColumn("str_col", lit(null).cast("string"))
      .select("num_col", "str_col")
    val p = Profile.tableProfile(df,
      Seq(ColSpec("num_col", "num"), ColSpec("str_col", "str")))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = p("str_col")
    assert(s.getLong(1) === 1L && s.getLong(2) === 1L && s.getLong(3) === 0L)
    assert(s.isNullAt(6) && s.isNullAt(7)) // min/max of nothing is null
    val n = p("num_col")
    assert(n.getLong(2) === 0L && n.getLong(3) === 1L)
    assert(n.getDouble(4) === 5.0 && n.getDouble(5) === 5.0)
  }

  test("tableProfile plan: one melt pass, no multi-distinct Expand, no shuffle join") {
    val qe = Profile.tableProfileOrders(spark, sf).queryExecution
    // the only join is the column-list stamp (a local 6-row broadcast)
    assert(!qe.executedPlan.toString.contains("SortMergeJoin"))
    // the multi-distinct rewrite would insert Expand; the melt must not
    assert(!qe.executedPlan.toString.contains("Expand"),
      qe.executedPlan.toString.take(1500))
  }

  test("tableProfile: an empty table still yields one zero row per column") {
    val empty = spark.range(0).select(col("id").as("num_col"),
      lit(null).cast("string").as("str_col"))
    val p = Profile.tableProfile(empty,
      Seq(ColSpec("num_col", "num"), ColSpec("str_col", "str")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("num_col", "str_col"))
    p.values.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
    }
  }

  test("cluster_purity: accounting ties out against the refine assignment") {
    val nVecs = graft.sources.Tables.load(spark, sf, "embeddings").count()
    val p = Similarity.clusterPurity(spark, sf).cache()
    assert(p.agg(sum("n_vecs")).head().getLong(0) === nVecs)
    assert(p.filter($"n_majority" > $"n_vecs" || $"n_majority" < 1).count() === 0)
    assert(p.filter($"purity" <= 0 || $"purity" > 1).count() === 0)
    assert(p.filter($"n_labels" < 1).count() === 0)
    p.unpersist()
  }
}
