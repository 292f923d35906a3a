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

  /** Existence through Hadoop FS — decision paths are URIs (`file:/…`),
    * which java.io.File cannot resolve. */
  private def segExists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

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

  test("latestOffset alignment is a distributed job, metadata-only when idle") {
    import java.util.concurrent.atomic.AtomicInteger
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val _ = spark // force session so SparkSession.active resolves
    val dir = Files.createTempDirectory("flyq-align").toString
    SegmentFiles.writeSegment(dir, "a", 0,
      (0L until 3L).map(i => Record(i, 1000 + i, str(s"k$i"), str(s"v$i"))))
    val stream = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("a"))
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val cleanLen = java.nio.file.Files.size(java.nio.file.Paths.get(
      dir, "topic_a", "partition_0", f"segment_${0L}%020d.log"))
    spark.sparkContext.addSparkListener(listener)
    try {
      val off1 = stream.latestOffset().asInstanceOf[FlyqOffset]
      assert(off1.fileBytes.values.toSeq === Seq(cleanLen))
      Thread.sleep(300)
      assert(jobs.get() >= 1, "growth: alignment must run as a Spark job")
      // idle trigger: no new bytes anywhere → strictly metadata-only
      val before = jobs.get()
      val off2 = stream.latestOffset().asInstanceOf[FlyqOffset]
      assert(off2 === off1)
      Thread.sleep(300)
      assert(jobs.get() === before,
        "no growth: latestOffset must be metadata-only (zero jobs)")
      // torn tail: half a record appended — the executor-side job aligns
      // back to the last complete boundary (and the torn bytes count as
      // pending growth on every later trigger until completed)
      val full = FlyqCodec.encodeRecord(3L, str("k3"), str("v3"), 1003L, null)
      appendRaw(dir, "a", 0, 0L, full.take(full.length - 5))
      val off3 = stream.latestOffset().asInstanceOf[FlyqOffset]
      assert(off3.fileBytes.values.toSeq === Seq(cleanLen),
        "offset must stay at the last complete record boundary")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("end-to-end consume lifecycle: v2 tail feeds group-offset commits") {
    import spark.implicits._
    import graft.streaming.GroupOffsets
    val dir = Files.createTempDirectory("flyq-e2e").toString
    val ckpt = Files.createTempDirectory("flyq-e2e-ckpt").toString
    SegmentFiles.writeSegment(dir, "e2e", 0,
      (0L until 5L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    SegmentFiles.writeSegment(dir, "e2e", 1,
      (0L until 3L).map(i => Record(i, 2000 + i, null, str(s"w$i"))))
    // the reference's two-phase consume/commit (SURVEY §3.2): each consumed
    // record yields a commit of next-offset-to-read = consumed + 1
    val commits = spark.readStream
      .format("graft.sources.v2.FlyqSegmentSource")
      .option("topic", "e2e").load(dir)
      .select(lit("grp-a").as("grp"), col("part_id").as("partId"),
        (col("msg_offset") + 1).as("offset"))
      .as[GroupOffsets.Commit]
    val q = GroupOffsets.track(commits)
      .writeStream.format("memory").queryName("e2e_offsets")
      .option("checkpointLocation", ckpt).outputMode("update").start()
    try {
      q.processAllAvailable()
      def committed(): Map[Long, Long] = spark.table("e2e_offsets")
        .groupBy("partId").agg(max("committed").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(committed() === Map(0L -> 5L, 1L -> 3L))
      // new segment rolls in partition 0; tracker advances monotonically
      SegmentFiles.writeSegment(dir, "e2e", 0,
        (5L until 7L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
      q.processAllAvailable()
      assert(committed() === Map(0L -> 7L, 1L -> 3L))
    } finally q.stop()
  }

  test("retired segments leave NEW v2 stream plans (M2, deferred deletion)") {
    import graft.operators.DeferredDelete
    val dir = Files.createTempDirectory("flyq-v2-dd").toString
    SegmentFiles.writeSegment(dir, "dd", 0,
      (0L until 3L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    SegmentFiles.writeSegment(dir, "dd", 0,
      (3L until 5L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    def freshRead(): Set[Long] = {
      val ckpt = Files.createTempDirectory("flyq-v2-dd-ckpt").toString
      val name = s"v2_dd_${System.nanoTime()}"
      val q = spark.readStream
        .format("graft.sources.v2.FlyqSegmentSource")
        .option("topic", "dd").load(dir)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        q.processAllAvailable()
        spark.table(name).select("msg_offset")
          .collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    // control: before retirement a fresh stream sees both segments
    assert(freshRead() === (0L until 5L).toSet)
    // retire everything but the active head (size cap), files kept
    val evicted = DeferredDelete.compactDeferred(spark, dir, "dd",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 2000L).filterNot(_.keep)
    assert(evicted.map(_.baseOff) === Seq(0L))
    assert(segExists(evicted.head.path), "retirement must not unlink the file")
    // a NEW stream plan excludes the retired segment — the v2 analog of
    // the reference's BTreeMap removal (segment.rs:336)
    assert(freshRead() === Set(3L, 4L))
  }

  test("lease-holding v2 stream: reap waits for it, in-flight tail survives retirement") {
    import graft.operators.DeferredDelete
    val dir = Files.createTempDirectory("flyq-v2-lease").toString
    val ckpt = Files.createTempDirectory("flyq-v2-lease-ckpt").toString
    SegmentFiles.writeSegment(dir, "lt", 0,
      (0L until 3L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    SegmentFiles.writeSegment(dir, "lt", 0,
      (3L until 5L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    val q = spark.readStream
      .format("graft.sources.v2.FlyqSegmentSource")
      .option("topic", "lt")
      .option("lease.holder", "v2-lease-spec")
      .load(dir)
      .writeStream.format("memory").queryName("v2_lease")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("v2_lease").count() === 5)
      // the stream registered itself as a reader of the topic
      val leases = DeferredDelete.liveLeases(spark, dir, "lt",
        nowMs = System.currentTimeMillis())
      assert(leases.exists(_.holder === "v2-lease-spec"))

      // concurrent retention retires the sealed segment; reap must hold
      // back because the stream's lease predates the retirement
      val evicted = DeferredDelete.compactDeferred(spark, dir, "lt",
        retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
        retireAtMs = System.currentTimeMillis()).filterNot(_.keep)
      assert(evicted.map(_.baseOff) === Seq(0L))
      val (del, held) = DeferredDelete.reap(spark, dir, "lt",
        nowMs = System.currentTimeMillis())
      assert(del.isEmpty && held === evicted.map(_.path))
      assert(segExists(evicted.head.path))

      // the in-flight tail keeps working: appends to the live head arrive
      appendRaw(dir, "lt", 0, 3L,
        FlyqCodec.encodeRecord(5L, str("k5"), str("v5"), 1005L, null))
      q.processAllAvailable()
      assert(spark.table("v2_lease").count() === 6)
    } finally q.stop()
    // stop() dropped the lease (the Arc drop) → reap unlinks
    assert(DeferredDelete.liveLeases(spark, dir, "lt",
      nowMs = System.currentTimeMillis()).isEmpty)
    val (del2, held2) = DeferredDelete.reap(spark, dir, "lt",
      nowMs = System.currentTimeMillis())
    assert(del2.nonEmpty && held2.isEmpty)
  }

  test("restart re-adopts the persisted lease: acquire time survives, reap stays blocked") {
    import graft.operators.DeferredDelete
    val dir = Files.createTempDirectory("flyq-v2-readopt").toString
    val ckpt = Files.createTempDirectory("flyq-v2-readopt-ckpt").toString
    SegmentFiles.writeSegment(dir, "ra", 0,
      (0L until 3L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    SegmentFiles.writeSegment(dir, "ra", 0,
      (3L until 5L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    // first incarnation: acquires a lease and persists its id under the
    // checkpoint; "crashes" (never stop()s, so the lease is not released)
    val s1 = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("ra"),
      Some("readopt-spec"), checkpointLocation = Some(ckpt))
    val off1 = s1.latestOffset()
    val lease1 = DeferredDelete.liveLeases(spark, dir, "ra",
      nowMs = System.currentTimeMillis()).find(_.holder == "readopt-spec").get
    // retention retires the sealed segment while the stream is DOWN
    val evicted = DeferredDelete.compactDeferred(spark, dir, "ra",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = System.currentTimeMillis()).filterNot(_.keep)
    assert(evicted.map(_.baseOff) === Seq(0L))
    // second incarnation, same checkpoint: Spark replays the offsets,
    // then the first listing must RE-ADOPT lease1 — a fresh lease (new
    // acquire time) would post-date the retirement and reap would unlink
    // a segment this checkpoint still has in its offset map (r12 advice #1)
    val s2 = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("ra"),
      Some("readopt-spec"), checkpointLocation = Some(ckpt))
    s2.deserializeOffset(off1.json())
    s2.latestOffset()
    val leases2 = DeferredDelete.liveLeases(spark, dir, "ra",
      nowMs = System.currentTimeMillis()).filter(_.holder == "readopt-spec")
    assert(leases2.map(_.id) === Seq(lease1.id),
      "restart must re-adopt the persisted lease, not acquire a second one")
    assert(leases2.head.acquiredMs === lease1.acquiredMs,
      "re-adoption must preserve the ORIGINAL acquire time")
    val (del, held) = DeferredDelete.reap(spark, dir, "ra",
      nowMs = System.currentTimeMillis())
    assert(del.isEmpty && held === evicted.map(_.path))
    DeferredDelete.releaseLease(spark, dir, "ra", lease1.id)
  }

  test("heartbeat renews the lease between triggers: a slow batch cannot lapse it") {
    import graft.operators.DeferredDelete
    val _ = spark // force session so SparkSession.active resolves
    val dir = Files.createTempDirectory("flyq-v2-hb").toString
    SegmentFiles.writeSegment(dir, "hb", 0,
      (0L until 3L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    // TTL far below the coming trigger gap: with renewal only on the
    // trigger path (the r12 design) the lease would lapse mid-gap and a
    // concurrent reap could unlink under a still-running batch
    val s = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("hb"),
      Some("hb-spec"), leaseTtlMs = 600L)
    s.latestOffset()
    val id = DeferredDelete.liveLeases(spark, dir, "hb",
      nowMs = System.currentTimeMillis()).find(_.holder == "hb-spec").get.id
    Thread.sleep(1800) // 3x the TTL, zero triggers
    // sample a few times: a DEAD heartbeat shows expired on every sample
    // (last possible expiry was acquire+TTL, 2 TTLs ago), while a live
    // one could lose a single-shot check to a GC-delayed beat on a busy
    // suite box (the flake this retry loop replaced)
    val live = (1 to 5).exists { _ =>
      val ok = DeferredDelete.liveLeases(spark, dir, "hb",
        nowMs = System.currentTimeMillis()).exists(_.id == id)
      if (!ok) Thread.sleep(150)
      ok
    }
    assert(live, "daemon heartbeat must keep the lease live with no triggers")
    s.stop()
    assert(DeferredDelete.liveLeases(spark, dir, "hb",
      nowMs = System.currentTimeMillis()).isEmpty, "stop() releases the lease")
  }

  test("a segment reaped with unconsumed bytes fails the restart LOUDLY") {
    import graft.operators.DeferredDelete
    val dir = Files.createTempDirectory("flyq-v2-lost").toString
    SegmentFiles.writeSegment(dir, "dl", 0,
      (0L until 3L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    SegmentFiles.writeSegment(dir, "dl", 0,
      (3L until 5L).map(i => Record(i, 1000 + i, null, str(s"v$i"))))
    // retire + reap with NO live lease (the tailing stream's lease lapsed
    // during a long downtime) — tombstone records the final size
    val evicted = DeferredDelete.compactDeferred(spark, dir, "dl",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = System.currentTimeMillis()).filterNot(_.keep)
    DeferredDelete.reap(spark, dir, "dl", nowMs = System.currentTimeMillis())
    assert(!segExists(evicted.head.path))
    val segPath = evicted.head.path
    val segSize = evicted.head.segBytes
    // restart from a checkpoint that had consumed only PART of the
    // segment: silent offset-drop here is silent record loss — the
    // default contract is a loud failure
    val s = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("dl"))
    s.deserializeOffset(FlyqOffset(Map(segPath -> (segSize - 10))).json())
    val err = intercept[IllegalStateException](s.latestOffset())
    assert(err.getMessage.contains("unconsumed"))
    // fully-consumed checkpoint: the same disappearance is the NORMAL
    // retire→reap lifecycle — restart proceeds and drops the entry
    val sOk = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("dl"))
    sOk.deserializeOffset(FlyqOffset(Map(segPath -> segSize)).json())
    val off = sOk.latestOffset().asInstanceOf[FlyqOffset]
    assert(!off.fileBytes.contains(segPath))
    // opt-out for topics managed outside the deferred-deletion protocol
    val sTolerant = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("dl"),
      failOnLostSegments = false)
    sTolerant.deserializeOffset(FlyqOffset(Map(segPath -> (segSize - 10))).json())
    sTolerant.latestOffset() // no throw
    // a file gone with NO tombstone (external deletion) also fails loudly
    val live = new java.io.File(s"$dir/topic_dl/partition_0")
      .listFiles().filter(_.getName.endsWith(".log")).head
    val livePath = "file:" + live.getAbsolutePath
    val liveSize = live.length()
    assert(live.delete())
    val sExt = new graft.sources.v2.FlyqMicroBatchStream(dir, Some("dl"))
    sExt.deserializeOffset(FlyqOffset(Map(livePath -> liveSize)).json())
    val err2 = intercept[IllegalStateException](sExt.latestOffset())
    assert(err2.getMessage.contains("outside the deferred-deletion protocol"))
  }

  test("v2 schema matches the batch reader's") {
    assert(FlyqSegmentSource.schema.fieldNames.toSeq ===
      Seq("part_id", "base_off", "msg_offset", "ts_ms", "mkey", "mvalue", "headers"))
  }
}
