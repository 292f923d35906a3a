package graft

import java.io.FileOutputStream
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FlyqCodec
import graft.sources.SegmentFiles
import graft.sources.SegmentFiles.Record
import graft.sources.v2.{FlyqOffset, FlyqSegmentSource}

class V2SourceSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  private def str(s: String) = s.getBytes("UTF-8")

  private def appendRaw(dir: String, topic: String, part: Int, base: Long,
                        bytes: Array[Byte]): Unit = {
    val f = java.nio.file.Paths.get(dir, s"topic_$topic", s"partition_$part",
      f"segment_$base%020d.log").toFile
    val out = new FileOutputStream(f, true)
    try out.write(bytes) finally out.close()
  }

  test("offset json roundtrip incl. escaped paths") {
    val o = FlyqOffset(Map("/tmp/a/segment_1.log" -> 42L,
      "/tmp/we\"ird\\p.log" -> 7L))
    assert(FlyqOffset.fromJson(o.json()) === o)
    assert(FlyqOffset.fromJson(FlyqOffset(Map.empty).json()) === FlyqOffset(Map.empty))
  }

  test("v2 source tails growing segments: only byte deltas, no reprocessing") {
    val dir = Files.createTempDirectory("flyq-v2").toString
    val ckpt = Files.createTempDirectory("flyq-v2-ckpt").toString
    SegmentFiles.writeSegment(dir, "t", 0,
      (0L until 4L).map(i => Record(i, 1000 + i, str(s"k$i"), str(s"v$i"))))
    val q = spark.readStream
      .format("graft.sources.v2.FlyqSegmentSource")
      .option("topic", "t")
      .load(dir)
      .writeStream.format("memory").queryName("v2_tail")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("v2_tail").count() === 4)
      // grow the SAME active segment (binaryFile cannot do this without
      // re-reading the whole file; the v2 source plans only the delta)
      appendRaw(dir, "t", 0, 0L,
        FlyqCodec.encodeRecord(4L, str("k4"), str("v4"), 1004L, null) ++
          FlyqCodec.encodeRecord(5L, str("k5"), str("v5"), 1005L, null))
      // and roll a brand-new segment in another partition
      SegmentFiles.writeSegment(dir, "t", 1,
        Seq(Record(0L, 2000L, null, str("p1"))))
      q.processAllAvailable()
      val rows = spark.table("v2_tail")
      assert(rows.count() === 7)
      assert(rows.filter(col("part_id") === 0).agg(max("msg_offset"))
        .head().getLong(0) === 5L)
      assert(rows.filter(col("part_id") === 1).count() === 1)
      // offsets are unique per partition — nothing was re-read
      val dup = rows.groupBy("part_id", "msg_offset").count()
        .filter(col("count") > 1)
      assert(dup.count() === 0)
      // torn tail: a truncated record at EOF is skipped without failing
      val full = FlyqCodec.encodeRecord(6L, str("k6"), str("v6"), 1006L, null)
      appendRaw(dir, "t", 0, 0L, full.take(full.length - 3))
      q.processAllAvailable()
      assert(spark.table("v2_tail").count() === 7)
    } finally q.stop()
  }

  test("v2 schema matches the batch reader's") {
    assert(FlyqSegmentSource.schema.fieldNames.toSeq ===
      Seq("part_id", "base_off", "msg_offset", "ts_ms", "mkey", "mvalue", "headers"))
  }
}
