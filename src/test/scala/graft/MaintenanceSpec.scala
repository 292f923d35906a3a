package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance
import graft.sources.SegmentFiles
import graft.sources.SegmentFiles.Record

/** The background cleanup loop (`runtime/flush.rs:75-108`,
  * `runtime/mod.rs:37-40`): periodic retention over every discovered
  * topic, one final pass on shutdown. Driven by the manual clock
  * ([[Maintenance.Runner.tick]]) so the spec is deterministic — the
  * interval is set far above the test's runtime. */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  private def b(s: String) = s.getBytes("UTF-8")
  private val DAY = 86400000L
  private val Now = 1700000000000L

  /** Two stale segments + one fresh active segment in partition 0. */
  private def writeStaleTopic(dir: String, topic: String): Unit = {
    SegmentFiles.writeSegment(dir, topic, 0,
      (0L until 10L).map(i => Record(i, Now - 30 * DAY, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, topic, 0,
      (10L until 20L).map(i => Record(i, Now - 20 * DAY, b(s"k$i"), b(s"v$i"))))
    SegmentFiles.writeSegment(dir, topic, 0,
      (20L until 25L).map(i => Record(i, Now, b(s"k$i"), b(s"v$i"))))
  }

  private def logs(dir: String, topic: String): Seq[String] =
    Files.list(Paths.get(dir, s"topic_$topic", "partition_0")).toArray
      .map(_.toString).filter(_.endsWith(".log")).sorted.toSeq

  private def awaitPasses(r: Maintenance.Runner, n: Long): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (r.passCount < n && System.nanoTime() < deadline) Thread.sleep(20)
    assert(r.passCount >= n, s"runner never reached $n passes")
  }

  test("ticked pass evicts stale segments in every topic; shutdown runs a final pass") {
    val dir = Files.createTempDirectory("flyq-maint").toString
    writeStaleTopic(dir, "m1")
    SegmentFiles.writeSegment(dir, "fresh", 0,
      (0L until 5L).map(i => Record(i, Now, b(s"k$i"), b(s"v$i"))))
    assert(logs(dir, "m1").size === 3)

    val runner = new Maintenance.Runner(spark, dir,
      intervalMs = 3600L * 1000, // manual clock only — never elapses
      retentionMs = 7 * DAY, retentionBytes = Long.MaxValue,
      nowMs = () => Some(Now)).start()
    try {
      runner.tick()
      awaitPasses(runner, 1)
      // stale segments gone, active survives; the fresh topic is intact
      assert(logs(dir, "m1").map(_.takeRight(32)) ===
        Seq("segment_00000000000000000020.log"))
      assert(logs(dir, "fresh").size === 1)
      assert(runner.lastPass.errors.isEmpty)
      assert(runner.lastPass.decisions.keySet === Set("m1", "fresh"))
      // low watermark persisted by the pass (partition.rs:285 analog)
      assert(graft.operators.Retention.lowWatermark(spark, dir, "m1", 0)
        === Some(20L))

      // a topic CREATED AFTER start is discovered by the next pass —
      // here the shutdown pass itself (flush.rs:101-105: final cleanup
      // before exit)
      writeStaleTopic(dir, "m2")
      assert(logs(dir, "m2").size === 3)
    } finally runner.close()

    // close() blocked until the final pass completed
    assert(logs(dir, "m2").map(_.takeRight(32)) ===
      Seq("segment_00000000000000000020.log"))
    val after = runner.passCount
    assert(after >= 2)
    // no further passes after close
    Thread.sleep(100)
    assert(runner.passCount === after)
  }

  test("a failing topic is reported and does not kill the pass") {
    val dir = Files.createTempDirectory("flyq-maint2").toString
    writeStaleTopic(dir, "ok")
    // an empty topic dir: discovery returns it, but its partition glob
    // matches nothing so compact's scan throws — the loop must record the
    // error and still clean the healthy topic (flush.rs:87-90 warn-and-
    // continue semantics)
    Files.createDirectories(Paths.get(dir, "topic_bad"))
    val runner = new Maintenance.Runner(spark, dir,
      intervalMs = 3600L * 1000,
      retentionMs = 7 * DAY, retentionBytes = Long.MaxValue,
      nowMs = () => Some(Now))
    // runOnce is the loop body — drive it synchronously
    val p1 = runner.runOnce()
    assert(p1.errors.keySet === Set("bad"))
    assert(p1.decisions.contains("ok"))
    assert(logs(dir, "ok").size === 1)
    // the pass is idempotent: a second run evicts nothing further
    val p2 = runner.runOnce()
    assert(p2.decisions("ok").forall(_.keep))
    runner.close()
  }

  test("keyCompaction pass runs the log cleaner after retention") {
    val dir = Files.createTempDirectory("flyq-maint-compact").toString
    // fresh keyed topic: duplicate keys across two non-active segments
    SegmentFiles.writeSegment(dir, "kc", 0, Seq(
      Record(0, Now, b("a"), b("v1")), Record(1, Now, b("b"), b("v1"))))
    SegmentFiles.writeSegment(dir, "kc", 0, Seq(
      Record(2, Now, b("a"), b("v2")), Record(3, Now, b("b"), b("v2"))))
    SegmentFiles.writeSegment(dir, "kc", 0, Seq(
      Record(4, Now, b("c"), b("active"))))
    val runner = new Maintenance.Runner(spark, dir,
      intervalMs = 3600L * 1000,
      retentionMs = 365 * DAY, retentionBytes = Long.MaxValue,
      nowMs = () => Some(Now), keyCompaction = true)
    val p = runner.runOnce()
    assert(p.errors.isEmpty)
    // segment 0 fully shadowed by segment 2 → deleted by the cleaner
    assert(p.compactions("kc").map(o => (o.baseOff, o.action)) ===
      Seq((0L, "delete"), (2L, "keep")))
    assert(logs(dir, "kc").size === 2)
    val offs = SegmentFiles.readTopic(spark, dir, "kc")
      .select("msg_offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs === Seq(2L, 3L, 4L))
    // without the flag, no compaction runs
    val plain = new Maintenance.Runner(spark, dir,
      intervalMs = 3600L * 1000, retentionMs = 365 * DAY,
      retentionBytes = Long.MaxValue, nowMs = () => Some(Now))
    assert(plain.runOnce().compactions.isEmpty)
    runner.close(); plain.close()
  }
}
