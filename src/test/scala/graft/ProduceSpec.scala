package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.Frame
import graft.sources.{Broker, SegmentFiles}
import graft.streaming.LogStream

/** Distributed produce facade (W1) + codec robustness hardening. */
class ProduceSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private lazy val produced: String = {
    val dir = Files.createTempDirectory("flyq-produce").toString
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(
        // every 10th message keyless → exercises the round-robin route
        when($"event_id" % 10 === 0, lit(null))
          .otherwise($"user_id".cast("string").cast("binary")).as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"),
        $"event_id")
    Broker.produce(ev, dir, "events", orderCols = Seq("ts_ms", "event_id"))
    dir
  }

  test("a second produce batch APPENDS: offsets continue past the recovered log end") {
    val dir = Files.createTempDirectory("flyq-produce-append").toString
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (s"k${i % 5}".getBytes, s"v$i".getBytes, 1000L + i, i))
        .toDF("mkey", "mvalue", "ts_ms", "event_id")
    Broker.produce(batch(0, 40), dir, "t", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 2)
    val firstEnd = SegmentFiles.readTopic(spark, dir, "t")
      .groupBy("part_id").agg(max("msg_offset").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Broker.produce(batch(40, 70), dir, "t", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 2)
    val back = SegmentFiles.readTopic(spark, dir, "t").cache()
    assert(back.count() === 70)
    // offsets stay dense 0..n-1 per partition across the two batches —
    // nothing overwritten, nothing duplicated, no gap at the batch seam
    val bad = back.groupBy("part_id").agg(
      min("msg_offset").as("mn"), max("msg_offset").as("mx"),
      count(lit(1)).as("cnt"), countDistinct("msg_offset").as("nd"))
      .filter($"mn" =!= 0 || $"mx" =!= $"cnt" - 1 || $"nd" =!= $"cnt")
    assert(bad.count() === 0)
    firstEnd.foreach { case (p, mx) =>
      assert(back.filter($"part_id" === p).agg(max("msg_offset"))
        .head().getLong(0) > mx, s"partition $p must grow past $mx")
    }
    back.unpersist()
  }

  test("appending with a numPartitions below the existing layout fails " +
      "loudly instead of silently re-routing keys (r17 data-plane review #1)") {
    val dir = Files.createTempDirectory("flyq-produce-nparts").toString
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (s"k$i".getBytes, s"v$i".getBytes, 1000L + i, i))
        .toDF("mkey", "mvalue", "ts_ms", "event_id")
    Broker.produce(batch(0, 40), dir, "t", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 4)
    // a later append with a smaller count would hash keys mod the new
    // count AND never recover partitions >= 2 — per-key history splits
    // and strands with no error; the partition count is a topic constant
    val e = intercept[IllegalArgumentException] {
      Broker.produce(batch(40, 50), dir, "t",
        orderCols = Seq("ts_ms", "event_id"), numPartitions = 2)
    }
    assert(e.getMessage.contains("partition count"))
    // the matching count still appends fine
    Broker.produce(batch(40, 50), dir, "t",
      orderCols = Seq("ts_ms", "event_id"), numPartitions = 4)
    assert(SegmentFiles.readTopic(spark, dir, "t").count() === 50)
  }

  test("keyed placement = reference (xxh3_64(key) as u32) % n (true broker parity)") {
    // every keyed record in the produced topic sits on EXACTLY the
    // partition the real broker's `topic.rs:90-93` would place it. The
    // expectation is the reference rule applied INLINE to the raw hash —
    // truncate to u32, then mod — NOT a call into Xxh3.partitionOf: the
    // r10 verdict showed a wrong production mod rule survives a spec that
    // derives its expectation from the function under test. hash64 itself
    // is pinned by Xxh3Spec's reference-C golden vectors.
    val np = graft.model.LogModel.NumPartitions
    val back = SegmentFiles.readTopic(spark, produced, "events")
      .filter($"mkey".isNotNull)
      .select($"part_id", $"mkey").collect()
    assert(back.nonEmpty)
    back.foreach { r =>
      val expect =
        (graft.functions.Xxh3.hash64(r.getAs[Array[Byte]](1)) & 0xffffffffL) %
          np.toLong
      assert(r.getLong(0) === expect,
        s"key ${new String(r.getAs[Array[Byte]](1))} on ${r.getLong(0)}, " +
          s"reference places it on $expect")
    }
  }

  test("produce writes executor-side multi-partition, multi-segment logs") {
    val back = SegmentFiles.readTopic(spark, produced, "events").cache()
    val n = graft.sources.Tables.load(spark, sf, "events").count()
    assert(back.count() === n)
    assert(back.select("part_id").distinct().count() > 1)
    // segment rotation happened (more than one base offset per partition)
    val multiSeg = back.select("part_id", "base_off").distinct()
      .groupBy("part_id").count().filter($"count" > 1)
    assert(multiSeg.count() > 0)
    // offsets dense 0..n-1 within every partition
    val bad = back.groupBy("part_id").agg(
      min("msg_offset").as("mn"), max("msg_offset").as("mx"),
      count(lit(1)).as("cnt"), countDistinct("msg_offset").as("nd"))
      .filter($"mn" =!= 0 || $"mx" =!= $"cnt" - 1 || $"nd" =!= $"cnt")
    assert(bad.count() === 0)
    // keyless rows CYCLE over partitions in arrival order (reference
    // topic.rs:79-83 — a per-keyless counter, NOT pmod of the global
    // arrival index, which would skew whenever the keyless stride shares
    // a factor with n): the i-th keyless message lands on i % n exactly
    val keyless = back.filter($"mkey".isNull)
      .orderBy("ts_ms", "msg_offset").select("part_id").collect()
      .map(_.getLong(0))
    assert(keyless.nonEmpty)
    val np = graft.model.LogModel.NumPartitions
    // order within equal ts is ambiguous from the read side, so check the
    // multiset per cycle instead: every window of np consecutive keyless
    // messages by arrival hits each partition exactly once
    keyless.grouped(np).filter(_.length == np).zipWithIndex.foreach {
      case (cycle, i) =>
        assert(cycle.sorted.toSeq === (0L until np.toLong).toSeq,
          s"cycle $i: ${cycle.toSeq}")
    }
  }

  test("structured streaming ingests a produce-written topic") {
    val ckpt = Files.createTempDirectory("flyq-produce-ckpt").toString
    val q = LogStream.readSegments(spark, produced, "events")
      .writeStream.format("memory").queryName("produced_ingest")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = graft.sources.Tables.load(spark, sf, "events").count()
      assert(spark.table("produced_ingest").count() === n)
    } finally q.stop()
  }

  test("frame decode rejects negative payload_len instead of throwing") {
    val buf = java.nio.ByteBuffer.allocate(Frame.HeaderLen)
    buf.put(1.toByte); buf.put(1.toByte); buf.putInt(7)
    buf.putInt(-5) // corrupt length with the sign bit set
    buf.putInt(0)
    assert(Frame.decode(buf.array()).isLeft)
  }

  test("record decode rejects mis-framing record_len 24..27 and bad inner lengths") {
    def recordWithLen(len: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + 40)
      b.putInt(len); b.putLong(0L); b.putLong(1000L)
      b.putInt(0); b.putInt(4); b.put("abcd".getBytes); b.putInt(0)
      b.array()
    }
    intercept[IllegalArgumentException] {
      graft.functions.FlyqCodec.decodeRecordAt(recordWithLen(26), 0)
    }
    // huge value_len must fail the bounds check, not allocate gigabytes
    val corrupt = java.nio.ByteBuffer.allocate(4 + 28)
    corrupt.putInt(28); corrupt.putLong(0L); corrupt.putLong(1000L)
    corrupt.putInt(0); corrupt.putInt(Int.MaxValue - 3); corrupt.putInt(0)
    intercept[IllegalArgumentException] {
      graft.functions.FlyqCodec.decodeRecordAt(corrupt.array(), 0)
    }
  }
}
