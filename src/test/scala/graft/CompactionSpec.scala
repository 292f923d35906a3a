package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction
import graft.sources.SegmentFiles
import graft.sources.SegmentFiles.Record

/** Executable key compaction (Kafka log-cleaner semantics over the FlyQ
  * segment layout): per (partition, key) only the highest-offset record
  * survives in non-active segments, offsets keep their gaps, the active
  * segment is never touched, tombstone winners disappear, keyless records
  * are unconditional survivors, and a second run is a no-op. */
class CompactionSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  private def b(s: String) = s.getBytes("UTF-8")
  private val TS = 1700000000000L

  /** Partition 0, three segments:
    *  seg 0 (0-5):   k0..k2 twice (0-2 shadowed by 3-5), k1 again at 4? —
    *    laid out so every key in seg0 is shadowed later
    *  seg 6 (6-11):  k3 fresh versions + tombstone for k0 + keyless pair
    *  seg 12 (12-13): active — k3 shadow lives HERE, must still win
    */
  private def writeTopic(dir: String): Unit = {
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(0, TS, b("k0"), b("v0a")),
      Record(1, TS, b("k1"), b("v1a")),
      Record(2, TS, b("k2"), b("v2a")),
      Record(3, TS, b("k1"), b("v1b")), // shadows offset 1
      Record(4, TS, b("k2"), b("v2b")), // shadows offset 2
      Record(5, TS, b("k4"), b("v4a"))))
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(6, TS, b("k1"), b("v1c")), // shadows offset 3
      Record(7, TS, b("k0"), Array.emptyByteArray), // tombstone: kills k0
      Record(8, TS, null, b("keyless-a")), // survives always
      Record(9, TS, b("k3"), b("v3a")),
      Record(10, TS, b("k2"), b("v2c")), // shadows offset 4
      Record(11, TS, null, b("keyless-b"))))
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(12, TS, b("k3"), b("v3b")), // active-segment shadow of 9
      Record(13, TS, b("k5"), b("v5a"))))
  }

  private def readAll(dir: String) =
    SegmentFiles.readTopic(spark, dir, "c")
      .select(col("msg_offset"), col("mkey").cast("string").as("k"),
        col("mvalue").cast("string").as("v"), col("base_off"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("key compaction keeps last version per key, offsets preserved, active untouched") {
    val dir = Files.createTempDirectory("flyq-compact").toString
    writeTopic(dir)

    val outcomes = Compaction.compactKeys(spark, dir, "c")
    // two non-active segments graded; seg0 loses everything but k4's
    // winner at offset 5; seg6 loses the shadowed k1@6, tombstone k0@7,
    // and k3@9 (shadowed from the ACTIVE segment)
    assert(outcomes.map(o => (o.baseOff, o.action)) ===
      Seq((0L, "rewrite"), (6L, "rewrite")))
    assert(outcomes.map(o => (o.recordsBefore, o.recordsAfter)) ===
      Seq((6L, 1L), (6L, 4L)))

    val after = readAll(dir)
    // winners with original offsets + the untouched active segment;
    // k0 (tombstoned), k1@1/3 and k2@2/4 (shadowed in-log), and k3@9
    // (shadowed from the ACTIVE segment) are gone
    assert(after === Seq(
      (5L, "k4", "v4a", 0L),
      (6L, "k1", "v1c", 6L),
      (8L, null, "keyless-a", 6L),
      (10L, "k2", "v2c", 6L),
      (11L, null, "keyless-b", 6L),
      (12L, "k3", "v3b", 12L),
      (13L, "k5", "v5a", 12L)))

    // filenames keep their base offsets; index files regenerated
    val files = Files.list(Paths.get(dir, "topic_c", "partition_0")).toArray
      .map(_.toString).filter(_.endsWith(".log")).sorted
    assert(files.map(f => f.substring(f.lastIndexOf('/') + 1)).toSeq ===
      Seq("segment_00000000000000000000.log",
        "segment_00000000000000000006.log",
        "segment_00000000000000000012.log"))
    assert(!Files.list(Paths.get(dir, "topic_c", "partition_0")).toArray
      .map(_.toString).exists(_.endsWith(".tmp")))
  }

  test("k1's latest non-active version survives when nothing later shadows it") {
    val dir = Files.createTempDirectory("flyq-compact2").toString
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(0, TS, b("a"), b("old")),
      Record(1, TS, b("a"), b("new")),
      Record(2, TS, b("b"), b("only"))))
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(3, TS, b("z"), b("active"))))
    Compaction.compactKeys(spark, dir, "c")
    assert(readAll(dir) === Seq(
      (1L, "a", "new", 0L), (2L, "b", "only", 0L),
      (3L, "z", "active", 3L)))
  }

  test("fully-shadowed segment is deleted outright") {
    val dir = Files.createTempDirectory("flyq-compact3").toString
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(0, TS, b("a"), b("v1")),
      Record(1, TS, b("b"), b("v1"))))
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(2, TS, b("a"), b("v2")),
      Record(3, TS, b("b"), b("v2"))))
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(4, TS, b("c"), b("active"))))
    val outcomes = Compaction.compactKeys(spark, dir, "c")
    assert(outcomes.map(o => (o.baseOff, o.action)) ===
      Seq((0L, "delete"), (2L, "keep")))
    val files = Files.list(Paths.get(dir, "topic_c", "partition_0")).toArray
      .map(_.toString).filter(f => f.endsWith(".log") || f.endsWith(".index"))
    assert(!files.exists(_.contains("segment_00000000000000000000")))
    assert(readAll(dir).map(_._1) === Seq(2L, 3L, 4L))
  }

  test("compaction is idempotent") {
    val dir = Files.createTempDirectory("flyq-compact4").toString
    writeTopic(dir)
    Compaction.compactKeys(spark, dir, "c")
    val firstPass = readAll(dir)
    val outcomes2 = Compaction.compactKeys(spark, dir, "c")
    assert(outcomes2.forall(_.action == "keep"))
    assert(readAll(dir) === firstPass)
  }

  test("multi-partition: each partition compacts independently") {
    val dir = Files.createTempDirectory("flyq-compact5").toString
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(0, TS, b("k"), b("p0-old")), Record(1, TS, b("k"), b("p0-new"))))
    SegmentFiles.writeSegment(dir, "c", 0, Seq(
      Record(2, TS, b("x"), b("p0-active"))))
    // same key bytes in partition 1 must NOT be shadowed by partition 0
    SegmentFiles.writeSegment(dir, "c", 1, Seq(
      Record(0, TS, b("k"), b("p1-only"))))
    SegmentFiles.writeSegment(dir, "c", 1, Seq(
      Record(1, TS, b("y"), b("p1-active"))))
    Compaction.compactKeys(spark, dir, "c")
    val rows = SegmentFiles.readTopic(spark, dir, "c")
      .select(col("part_id"), col("msg_offset"),
        col("mvalue").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows === Seq(
      (0L, 1L, "p0-new"), (0L, 2L, "p0-active"),
      (1L, 0L, "p1-only"), (1L, 1L, "p1-active")))
  }
}
