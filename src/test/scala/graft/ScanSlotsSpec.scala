package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** spreadIfNarrow's gating must FAIL OPEN (r17 verdict #1): the helper's
  * contract is "exact no-op at cluster scale", so any path it cannot
  * stat — remote filesystems it has no credentials for, moved files,
  * permission errors — must yield "plenty of slots" (no repartition),
  * never "one slot" (unconditional full-table shuffle). */
class ScanSlotsSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  test("unstattable path fails open: Int.MaxValue slots") {
    assert(Tables.estimatedScanSlots(spark,
      "/nonexistent/dir", "documents") === Int.MaxValue)
  }

  test("unstattable path: spreadIfNarrow adds no repartition to the plan") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Tables.spreadIfNarrow(spark, "/nonexistent/dir",
      "documents", df, col("doc_id"))
    assert(out eq df, "spreadIfNarrow must be an exact no-op " +
      "(same frame) when the table cannot be statted")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"no exchange may be injected for an unstattable table:\n$plan")
  }

  test("empty directory fails open") {
    val dir = java.nio.file.Files.createTempDirectory("scanslots").toFile
    val tbl = new java.io.File(dir, "documents.parquet")
    assert(tbl.mkdir())
    assert(Tables.estimatedScanSlots(spark,
      dir.getPath, "documents") === Int.MaxValue)
  }

  test("single small local file estimates one slot (the spread fires)") {
    val slots = Tables.estimatedScanSlots(spark,
      "/root/testdata/sf0.001", "documents")
    assert(slots >= 1 && slots < spark.sparkContext.defaultParallelism,
      s"tiny single-file table must read as narrow, got $slots")
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Tables.spreadIfNarrow(spark, "/root/testdata/sf0.001",
      "documents", df, col("doc_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      s"narrow local table must be spread:\n$plan")
  }

  test("single file wider than maxSplit is capped by its row-group count") {
    // one ~1.2 MB file, ONE row group; maxPartitionBytes forced tiny so
    // byte-split math alone would estimate many slots — the footer cap
    // must pull the estimate back to the real decode parallelism (1)
    val dir = java.nio.file.Files.createTempDirectory("rowgroup").toFile
    import spark.implicits._
    (1 to 20000).map(i => (i.toLong, s"text $i body padding %08d".format(i)))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024 * 1024).toString)
      .parquet(s"${dir.getPath}/documents.parquet")
    val conf = spark.sessionState.conf
    val prevMax = conf.getConfString("spark.sql.files.maxPartitionBytes")
    val prevCost = conf.getConfString("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val slots = Tables.estimatedScanSlots(spark, dir.getPath, "documents")
      assert(slots === 1,
        s"one-row-group single file must estimate 1 slot, got $slots")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }
}
