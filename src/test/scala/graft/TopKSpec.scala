package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK

/** Property-style test for the bounded top-k aggregate: for random data,
  * partition layouts, and k (seeded — reproducible), the aggregate must
  * equal the sort-based definition. This pins the partial/merge path
  * (map-side combine + shuffle of serialized buffers), which a
  * hand-picked fixture wouldn't stress. */
class TopKSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  test("top_k_structs == sort-and-take under random data and partitioning") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 20) {
      val n = rnd.nextInt(121)
      val k = 1 + rnd.nextInt(5)
      val parts = 1 + rnd.nextInt(8)
      val rows = Seq.fill(n)((
        s"g${rnd.nextInt(3)}",
        rnd.nextLong(2001) - 1000L,
        rnd.nextLong(10001)))
      val got = rows.toDF("g", "v", "id").repartition(parts)
        .groupBy("g")
        .agg(TopK.top_k_structs(struct(col("v"), col("id")), k).as("top"))
        .select(col("g"), explode(col("top")).as("s"))
        .select(col("g"), col("s.v"), col("s.id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      val want = rows.groupBy(_._1).view.mapValues {
        vs => vs.map(t => (t._2, t._3)).sorted.take(k)
      }.toMap
      assert(got === want, s"trial $trial: n=$n k=$k parts=$parts")
    }
  }
}
