package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retention
import graft.sources.SegmentFiles
import graft.sources.SegmentFiles.Record

/** Executable retention (M1 applied) — mirrors the reference's
  * `flyq-server/tests/retention.rs:9-197`: evicted segment files disappear
  * from disk, the active segment survives even when stale, and the
  * persisted low watermark bumps to the first retained offset. */
class RetentionSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  private def b(s: String) = s.getBytes("UTF-8")
  private val DAY = 86400000L

  /** 3 segments in partition 0: offsets 0-9 (old), 10-19 (old), 20-24
    * (fresh, active); 1 fresh segment in partition 1. */
  private def writeTopic(dir: String, now: Long): Unit = {
    SegmentFiles.writeSegment(dir, "r", 0,
      (0L until 10L).map(i => Record(i, now - 30 * DAY, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, "r", 0,
      (10L until 20L).map(i => Record(i, now - 20 * DAY, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, "r", 0,
      (20L until 25L).map(i => Record(i, now, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, "r", 1,
      (0L until 5L).map(i => Record(i, now, b(s"k$i"), b(s"v$i"))))
  }

  private def segFiles(dir: String, part: Int): Seq[String] =
    Files.list(Paths.get(dir, "topic_r", s"partition_$part")).toArray
      .map(_.toString).filter(_.endsWith(".log")).sorted.toSeq

  test("time retention deletes stale segments, keeps active, bumps low watermark") {
    val dir = Files.createTempDirectory("flyq-ret").toString
    val now = 1700000000000L
    writeTopic(dir, now)
    assert(segFiles(dir, 0).size === 3)

    val decisions = Retention.compact(spark, dir, "r",
      retentionMs = 7 * DAY, retentionBytes = Long.MaxValue)
    // partition 0: segments 0 and 10 stale → gone; 20 (active) stays
    assert(segFiles(dir, 0).map(f => f.substring(f.length - 32)) ===
      Seq("segment_00000000000000000020.log"))
    assert(segFiles(dir, 1).size === 1)
    // index files of evicted segments are gone too
    val remaining = Files.list(Paths.get(dir, "topic_r", "partition_0"))
      .toArray.map(_.toString).filter(_.endsWith(".index"))
    assert(remaining.length === 1)

    // post-compaction read returns exactly the retained records
    val offs = SegmentFiles.readTopic(spark, dir, "r")
      .filter(org.apache.spark.sql.functions.col("part_id") === 0)
      .select("msg_offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq === (20L until 25L))

    // persisted low watermark = first retained offset (partition.rs:285),
    // stored as the reference's meta.json snapshot (partiton_meta.rs:8-13)
    assert(Retention.lowWatermark(spark, dir, "r", 0L) === Some(20L))
    assert(Retention.lowWatermark(spark, dir, "r", 1L) === Some(0L))
    assert(Retention.Meta.read(spark,
      s"$dir/topic_r/partition_0") === Some((20L, 24L, 25L)))
    assert(!Files.exists(Paths.get(dir, "topic_r", "partition_0",
      "meta.json.tmp")), "atomic rename leaves no tmp file")
    val wm = Retention.watermarksOnDisk(spark, dir, "r")
    assert(wm(0L) === ((20L, 24L, 25L)))
    assert(wm(1L) === ((0L, 4L, 5L)))

    // idempotent: nothing else to evict on a second run
    val again = Retention.compact(spark, dir, "r",
      retentionMs = 7 * DAY, retentionBytes = Long.MaxValue)
    assert(again.forall(_.keep))
    assert(segFiles(dir, 0).size === 1)
    assert(decisions.count(!_.keep) === 2)
  }

  test("size cap evicts oldest-first even when fresh; active always kept") {
    val dir = Files.createTempDirectory("flyq-ret-size").toString
    val now = 1700000000000L
    // all three segments fresh → time rule keeps everything
    SegmentFiles.writeSegment(dir, "r", 0,
      (0L until 10L).map(i => Record(i, now, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, "r", 0,
      (10L until 20L).map(i => Record(i, now, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, "r", 0,
      (20L until 25L).map(i => Record(i, now, b(s"k$i"), b(s"v$i"))))
    val segBytes = Files.size(Paths.get(segFiles(dir, 0).head))
    // cap fits the active segment + one more → oldest of the three goes
    val plan = Retention.compact(spark, dir, "r",
      retentionMs = Long.MaxValue / 2, retentionBytes = 2 * segBytes)
    assert(segFiles(dir, 0).size === 2)
    assert(plan.filter(_.partId == 0).sortBy(_.baseOff).map(_.keep) ===
      Seq(false, true, true))
    assert(Retention.lowWatermark(spark, dir, "r", 0L) === Some(10L))

    // tighten the cap below even the active segment: active STILL kept
    Retention.compact(spark, dir, "r",
      retentionMs = Long.MaxValue / 2, retentionBytes = 1L)
    assert(segFiles(dir, 0).map(f => f.substring(f.length - 32)) ===
      Seq("segment_00000000000000000020.log"))
    assert(Retention.lowWatermark(spark, dir, "r", 0L) === Some(20L))
  }
}
