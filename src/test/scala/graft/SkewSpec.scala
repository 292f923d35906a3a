package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join correctness + shape: results must equal the plain join,
  * and the physical join key must include the salt column so a hot key
  * fans out over `salts` tasks instead of one. */
class SkewSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  test("salted join == plain join on skewed data, with (key, salt) join key") {
    // 90% of fact rows share one hot key
    val fact = (0 until 2000).map { i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot", s"p$i")
    }.toDF("id", "k", "payload")
    val dim = Seq(("hot", 1L), ("k0", 2L), ("k3", 3L)).toDF("k", "dim_val")

    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, "k", col("id"), salts = 8)

    assert(salted.columns.toSeq === plain.columns.toSeq)
    val a = salted.select("k", "id", "payload", "dim_val").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val b = plain.select("k", "id", "payload", "dim_val").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(a.toSeq === b.toSeq)

    // the join condition carries the salt (one hot key -> `salts` buckets)
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("__salt"),
      "physical join must key on (k, __salt)")
    // and the probe side's salt spreads the hot key across all 8 values
    val spread = fact
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(8L)))
      .filter(col("k") === "hot")
      .select(countDistinct("__salt")).head().getLong(0)
    assert(spread === 8L)
  }

  test("skew_report: hot flag and salt count consistent with recomputed counts") {
    val sf = "/root/testdata/sf0.001"
    val r = Skew.skewReport(spark, sf).collect()
    assert(r.nonEmpty && r.length <= Skew.SkewTopK)
    // srank is 1..n in cnt-desc order
    assert(r.map(_.getAs[Long]("srank")).toSeq === (1L to r.length).toSeq)
    val cnts = r.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse)
    // recompute totals independently
    val byKey = graft.sources.Tables.load(spark, sf, "orders")
      .groupBy("o_custkey").count().collect()
      .map(x => x.getAs[Long]("o_custkey") -> x.getAs[Long]("count")).toMap
    val nKeys = byKey.size.toLong
    val nRows = byKey.values.sum
    r.foreach { row =>
      val cnt = row.getAs[Long]("cnt")
      assert(cnt === byKey(row.getAs[Long]("o_custkey")))
      val hot = cnt * nKeys >= Skew.SkewHotFactor * nRows
      assert(row.getAs[Boolean]("is_hot") === hot)
      val expSalts = if (hot) (cnt * nKeys + nRows - 1) / nRows else 1L
      assert(row.getAs[Long]("recommended_salts") === expSalts)
      val share = row.getAs[Double]("key_share")
      assert(share > 0.0 && share <= 1.0)
    }
    // the report's top key is the true heaviest key
    assert(cnts.head === byKey.values.max)
  }
}
