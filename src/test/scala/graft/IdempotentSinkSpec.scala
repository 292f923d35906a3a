package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IdempotentSink

/** Round-13 verdict #7 — the write side of the exactly-once streaming
  * contract: crash BETWEEN the sink commit and the checkpoint advance
  * (the at-least-once window of plain foreachBatch appends), restart,
  * no duplicate rows. */
class IdempotentSinkSpec extends AnyFunSuite {
  private lazy val spark = Testing.spark

  test("crash after sink commit, before checkpoint: the replay writes nothing twice") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("idem-ckpt").toString
    val out = Files.createTempDirectory("idem-out").toString
    val input = MemoryStream[Int](spark)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = input.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        IdempotentSink.write(df, id, out)
        // the injected crash: the sink has committed, the checkpoint has
        // NOT — Structured Streaming will replay this exact batch id
        if (crashed.compareAndSet(false, true))
          throw new RuntimeException("injected crash after sink commit")
      }
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    input.addData(1, 2, 3)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    // restart from the same checkpoint: batch 0 is REPLAYED into the
    // sink, which must recognize its commit marker and skip whole
    val q2 = start()
    try {
      input.addData(4, 5)
      q2.processAllAvailable()
      val got = IdempotentSink.committed(spark, out)
        .select("value").as[Int].collect().sorted.toSeq
      assert(got === Seq(1, 2, 3, 4, 5),
        "each input row must appear EXACTLY once across the crash-replay")
    } finally q2.stop()
  }

  test("replayed batch id is skipped; a partial from a crashed attempt is invisible") {
    import spark.implicits._
    val out = Files.createTempDirectory("idem-unit").toString
    assert(IdempotentSink.write(Seq(1, 2).toDF("value"), 0L, out))
    // replay of a committed batch: skipped whole, even with different data
    assert(!IdempotentSink.write(Seq(99).toDF("value"), 0L, out))
    assert(IdempotentSink.committed(spark, out)
      .select("value").as[Int].collect().sorted.toSeq === Seq(1, 2))
    // a crashed attempt of batch 1 left a PARTIAL directory (no
    // _SUCCESS — the write never finished), no marker: readers never
    // see it...
    Seq(7, 8).toDF("value").write.parquet(s"$out/batch_id=1")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(out, "batch_id=1", "_SUCCESS"))
    assert(IdempotentSink.committed(spark, out)
      .select("value").as[Int].collect().sorted.toSeq === Seq(1, 2))
    // ...and the retry replaces it, then commits
    assert(IdempotentSink.write(Seq(10).toDF("value"), 1L, out))
    assert(IdempotentSink.committed(spark, out)
      .select("value").as[Int].collect().sorted.toSeq === Seq(1, 2, 10))
    // batch_id rides along as the partition column
    assert(IdempotentSink.committed(spark, out).columns.toSet ===
      Set("value", "batch_id"))
  }

  test("publish is by atomic rename: a crashed-publish leftover is " +
      "ADOPTED, never clobbered under its marker (r17 lifecycle review #3)") {
    import spark.implicits._
    val out = Files.createTempDirectory("idem-pub").toString
    assert(IdempotentSink.write(Seq(1, 2, 3).toDF("value"), 0L, out))
    // crash AFTER the publish rename, BEFORE the marker: the marker is
    // missing but the batch directory holds a COMPLETE attempt's output
    val marker = java.nio.file.Paths.get(out, "_commits", "0")
    java.nio.file.Files.delete(marker)
    // the replay (different data — simulating the nondeterministic-
    // upstream worst case) must adopt the complete published attempt;
    // the OLD in-place mode("overwrite") would have deleted it mid-air,
    // and a zombie attempt could do that even after the marker landed
    assert(IdempotentSink.write(Seq(99).toDF("value"), 0L, out))
    assert(java.nio.file.Files.exists(marker))
    assert(IdempotentSink.committed(spark, out)
      .select("value").as[Int].collect().sorted.toSeq === Seq(1, 2, 3),
      "the committed directory must hold ONE complete attempt's output")
    // no staging leftovers accumulate
    val staging = new java.io.File(s"$out/_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty)
  }
}
