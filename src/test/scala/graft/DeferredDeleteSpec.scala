package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DeferredDelete, Retention}
import graft.sources.{Broker, SegmentFiles}

/** M2 — drop-based deferred deletion (`segment.rs:336`), round 12: the
  * lease-based analog of the reference's RAII segment handle. Eviction
  * RETIRES segments (manifest + disappearance from every NEW read plan);
  * the file is unlinked only when no live lease predates the retirement.
  */
class DeferredDeleteSpec extends AnyFunSuite {
  private lazy val spark = Testing.spark
  import spark.implicits._

  /** A topic with enough rotation to have evictable old segments. */
  private lazy val base: String = {
    val dir = Files.createTempDirectory("flyq-deferred").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(
        $"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"),
        $"event_id")
    Broker.produce(ev, dir, "ev", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 2) // 4 KiB default segments → rotation
    dir
  }

  private def logFiles(): Seq[java.io.File] =
    (0 to 1).flatMap { p =>
      val d = new java.io.File(s"$base/topic_ev/partition_$p")
      Option(d.listFiles()).toSeq.flatten.filter(_.getName.endsWith(".log"))
    }

  test("retire → invisible to new readers, file survives, lease gates reap") {
    val before = SegmentFiles.readTopic(spark, base, "ev")
    val nBefore = before.count()
    val filesBefore = logFiles().size
    assert(filesBefore > 2, s"need rotation, got $filesBefore segments")

    // a reader holding the pre-retirement view (the Arc handle)
    val leaseA = DeferredDelete.acquireLease(spark, base, "ev",
      holder = "reader-a", ttlMs = 1000000L, nowMs = 1000L)

    // evict everything but the active segment via the size cap
    val decisions = DeferredDelete.compactDeferred(spark, base, "ev",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 2000L)
    val evicted = decisions.filterNot(_.keep)
    assert(evicted.nonEmpty)
    assert(decisions.count(_.keep) === 2) // one active head per partition

    // the segment LEFT THE LOG (reference: removed from the BTreeMap)...
    val after = SegmentFiles.readTopic(spark, base, "ev")
    assert(after.count() < nBefore)
    val liveBases = after.select("part_id", "base_off").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    evicted.foreach(d => assert(!liveBases((d.partId, d.baseOff))))
    // ...the local listing agrees (server/broker path)...
    for (p <- 0 to 1) {
      val bases = SegmentFiles.segmentBases(
        Paths.get(base, "topic_ev", s"partition_$p"))
      evicted.filter(_.partId == p)
        .foreach(d => assert(!bases.contains(d.baseOff)))
    }
    // ...the low watermark bumped to the first retained offset...
    val wm = Retention.watermarksOnDisk(spark, base, "ev")
    for (p <- 0 to 1)
      assert(wm(p.toLong)._1 ===
        decisions.filter(d => d.keep && d.partId == p).map(_.baseOff).min)
    // ...but every evicted FILE is still on disk, and the pre-retirement
    // reader can still decode it (the RAII guarantee)
    assert(logFiles().size === filesBefore)
    val held = spark.read.format("binaryFile").load(evicted.head.path)
      .select(graft.functions.FlyqCodec
        .flyq_decode_segment($"content").as("recs"))
      .select(explode($"recs")).count()
    assert(held > 0)

    // reap while the pre-retirement lease lives: nothing unlinks
    // (maxSkewMs = 0 throughout this file's synthetic millisecond clocks;
    // the production default margin has its own test below)
    val (del1, held1) = DeferredDelete.reap(spark, base, "ev", nowMs = 3000L, maxSkewMs = 0L)
    assert(del1.isEmpty && held1.size === evicted.size)
    assert(logFiles().size === filesBefore)

    // a lease acquired AFTER retirement does not block (its read plan
    // already excluded the retired segments)
    val leaseB = DeferredDelete.acquireLease(spark, base, "ev",
      holder = "reader-b", ttlMs = 1000000L, nowMs = 2500L)

    // the last pre-retirement handle drops → reap unlinks
    DeferredDelete.releaseLease(spark, base, "ev", leaseA)
    val (del2, held2) = DeferredDelete.reap(spark, base, "ev", nowMs = 4000L, maxSkewMs = 0L)
    assert(del2.toSet === evicted.map(_.path).toSet && held2.isEmpty)
    assert(logFiles().size === filesBefore - evicted.size)
    assert(DeferredDelete.retired(spark, base, "ev").isEmpty)
    // idempotent: nothing left to reap, nothing new to retire
    assert(DeferredDelete.reap(spark, base, "ev", nowMs = 5000L, maxSkewMs = 0L) ===
      ((Seq.empty, Seq.empty)))
    assert(DeferredDelete.compactDeferred(spark, base, "ev",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 6000L).filterNot(_.keep).isEmpty)
    DeferredDelete.releaseLease(spark, base, "ev", leaseB)

    // the surviving log still serves reads, offsets intact from the bump
    val remaining = SegmentFiles.readTopic(spark, base, "ev")
    for (p <- 0 to 1)
      assert(remaining.filter($"part_id" === p)
        .agg(min("msg_offset")).head().getLong(0) === wm(p.toLong)._1)
  }

  test("renewal extends expiry but keeps the acquire time (reap still gated)") {
    val dir = Files.createTempDirectory("flyq-deferred3").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(200)
      .select($"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"), $"event_id")
    Broker.produce(ev, dir, "ev3", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 1)
    val id = DeferredDelete.acquireLease(spark, dir, "ev3",
      holder = "tail", ttlMs = 1000L, nowMs = 1000L)
    val evicted = DeferredDelete.compactDeferred(spark, dir, "ev3",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 1500L).filterNot(_.keep)
    assert(evicted.nonEmpty)
    // renew AFTER the retirement: expiry extends, acquire time must NOT
    // move — a renewal that reset it would make this pre-retirement
    // reader look post-retirement, and reap would unlink under it
    DeferredDelete.renewLease(spark, dir, "ev3", id, ttlMs = 1000000L,
      nowMs = 1800L)
    val l = DeferredDelete.liveLeases(spark, dir, "ev3", nowMs = 2000L)
      .find(_.id == id).get
    assert(l.acquiredMs === 1000L && l.expiresMs === 1001800L
      && l.holder === "tail")
    val (del, held) = DeferredDelete.reap(spark, dir, "ev3", nowMs = 5000L, maxSkewMs = 0L)
    assert(del.isEmpty && held.size === evicted.size,
      "renewed pre-retirement lease must still gate the reap")
    DeferredDelete.releaseLease(spark, dir, "ev3", id)
    val (del2, _) = DeferredDelete.reap(spark, dir, "ev3", nowMs = 6000L, maxSkewMs = 0L)
    assert(del2.toSet === evicted.map(_.path).toSet)
    // renewal of the RELEASED lease must not resurrect it (r13: a leaked
    // heartbeat timer firing after releaseLease would otherwise re-create
    // the file under holder "renewed" and block every future reap)
    assert(!DeferredDelete.renewLease(spark, dir, "ev3", id,
      ttlMs = 1000000L, nowMs = 7000L), "renew of a released lease must report lost")
    assert(DeferredDelete.liveLeases(spark, dir, "ev3", nowMs = Long.MinValue)
      .isEmpty, "renew of a released lease must not recreate the file")
    // orphan sweep (r14 review): a renewal that crashed between its
    // recreating write and its tombstone-check delete leaves lease file
    // + tombstone coexisting, and liveLeases skips tombstoned ids — the
    // NEXT renewal's miss path must clean the orphan up, or the pair
    // pins a dir entry forever (gc keeps tombstones while files exist)
    val conf = spark.sessionState.newHadoopConf()
    val leaseFile = new org.apache.hadoop.fs.Path(
      s"$dir/topic_ev3/_leases/$id.json")
    val fs = leaseFile.getFileSystem(conf)
    val out = fs.create(leaseFile, true)
    out.write("""{"holder":"crashed","acquired_ms":1,"expires_ms":2}"""
      .getBytes("UTF-8")); out.close()
    assert(!DeferredDelete.renewLease(spark, dir, "ev3", id,
      ttlMs = 1000000L, nowMs = 8000L))
    assert(!fs.exists(leaseFile),
      "a tombstoned orphan lease file must be swept by the next renewal")
  }

  test("clock-skew margin: a skewed reaper must NOT unlink under a live lease") {
    // r12 verdict #4: acquire/expiry stamps come from READER clocks,
    // nowMs/retiredAtMs from the reaper's — the margin must absorb a
    // disagreement of up to maxSkewMs in EITHER comparison, erring toward
    // holding the file. Reader clock runs 500ms AHEAD of the retention
    // job's here.
    val dir = Files.createTempDirectory("flyq-deferred4").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(200)
      .select($"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"), $"event_id")
    Broker.produce(ev, dir, "ev4", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 1)
    // reader stamps acquire=10000 on ITS clock; the retention job's clock
    // is 500ms behind, so the retirement this reader actually PRECEDED is
    // stamped 9500 — the raw acquiredMs <= retiredAtMs rule would call
    // the reader post-retirement and unlink under it
    val id = DeferredDelete.acquireLease(spark, dir, "ev4",
      holder = "tail", ttlMs = 2000L, nowMs = 10000L)
    val evicted = DeferredDelete.compactDeferred(spark, dir, "ev4",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 9500L).filterNot(_.keep)
    assert(evicted.nonEmpty)
    // reaper's clock reads 12500: the lease (expires 12000 on the
    // reader's clock) LOOKS expired by 500 — inside the margin, and the
    // acquire-vs-retirement gap (10000 vs 9500) is inside it too. Both
    // comparisons must hold the file.
    val (del, held) = DeferredDelete.reap(spark, dir, "ev4",
      nowMs = 12500L, maxSkewMs = 1000L)
    assert(del.isEmpty && held.size === evicted.size,
      "a reap inside the skew margin must hold the file")
    // past expiry + margin the crashed-reader rule takes over: the margin
    // delays the reap, it can never pin storage forever
    val (del2, held2) = DeferredDelete.reap(spark, dir, "ev4",
      nowMs = 13100L, maxSkewMs = 1000L)
    assert(del2.toSet === evicted.map(_.path).toSet && held2.isEmpty)
    // tombstones recorded with the segments' final sizes (the restart
    // classification input for the v2 source's lost-segment check)
    val tombs = DeferredDelete.reaped(spark, dir, "ev4")
    assert(tombs.map(_.path).toSet === evicted.map(_.path).toSet)
    assert(tombs.forall(t => t.sizeBytes > 0 && t.reapedAtMs === 13100L))
    assert(tombs.map(t => (t.partId, t.baseOff)).toSet ===
      evicted.map(d => (d.partId, d.baseOff)).toSet)
  }

  test("an expired pre-retirement lease cannot pin storage (crashed reader)") {
    val dir = Files.createTempDirectory("flyq-deferred2").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(200)
      .select($"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"), $"event_id")
    Broker.produce(ev, dir, "ev2", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 1)
    // short-lived lease from a reader that never released (crash)
    DeferredDelete.acquireLease(spark, dir, "ev2",
      holder = "crashed", ttlMs = 10L, nowMs = 1000L)
    val evicted = DeferredDelete.compactDeferred(spark, dir, "ev2",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 2000L).filterNot(_.keep)
    assert(evicted.nonEmpty)
    // the lease predates retirement but is EXPIRED at reap time
    val (deleted, heldBack) =
      DeferredDelete.reap(spark, dir, "ev2", nowMs = 5000L, maxSkewMs = 0L)
    assert(deleted.toSet === evicted.map(_.path).toSet && heldBack.isEmpty)
  }

  test("crash-mid-reap is idempotent: re-running reap converges (r13 #8)") {
    val dir = Files.createTempDirectory("flyq-deferred3").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(400)
      .select($"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"), $"event_id")
    Broker.produce(ev, dir, "ev3", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 1)
    val evicted = DeferredDelete.compactDeferred(spark, dir, "ev3",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 2000L).filterNot(_.keep)
    assert(evicted.size >= 2, s"need >=2 retired segments, got $evicted")
    val paths = evicted.map(_.path).toSet

    // CRASH SHAPE 1 — killed between the unlinks and the tombstone write:
    // on disk that is "files gone, manifest still lists them, no
    // tombstones". Simulate by unlinking exactly what reap would.
    val hconf = spark.sessionState.newHadoopConf()
    evicted.foreach { e =>
      val p = new org.apache.hadoop.fs.Path(e.path)
      assert(p.getFileSystem(hconf).delete(p, false))
      val idx = new org.apache.hadoop.fs.Path(
        e.path.replaceAll("\\.log$", ".index"))
      idx.getFileSystem(hconf).delete(idx, false)
    }
    assert(DeferredDelete.retired(spark, dir, "ev3").size === evicted.size)
    // the re-run reaps the same set: unlinks are no-ops, tombstones and
    // the manifest truncation land
    val (del1, held1) =
      DeferredDelete.reap(spark, dir, "ev3", nowMs = 3000L, maxSkewMs = 0L)
    assert(del1.toSet === paths && held1.isEmpty)
    assert(DeferredDelete.retired(spark, dir, "ev3").isEmpty)
    val ts1 = DeferredDelete.reaped(spark, dir, "ev3")
    assert(ts1.map(_.path).toSet === paths)
    assert(ts1.map(_.path).distinct.size === ts1.size, s"dup tombstones: $ts1")

    // CRASH SHAPE 2 — killed between the tombstone write and the manifest
    // truncation: "files gone, tombstones present, manifest STILL lists
    // them". Simulate by restoring the pre-reap manifest over the
    // truncated one.
    val manifest = new java.io.File(s"$dir/topic_ev3/_retired.json")
    val entries = evicted.map(e => graft.operators.DeferredDelete
      .RetiredSegment(e.path, e.partId, e.baseOff, 2000L, e.segBytes))
    DeferredDelete.restoreManifestForTest(spark, dir, "ev3", entries)
    assert(DeferredDelete.retired(spark, dir, "ev3").size === evicted.size)
    val (del2, held2) =
      DeferredDelete.reap(spark, dir, "ev3", nowMs = 4000L, maxSkewMs = 0L)
    assert(del2.toSet === paths && held2.isEmpty)
    // CONVERGED: manifest empty, one tombstone per path (the re-reap
    // supersedes the old tombstone instead of duplicating it)
    assert(DeferredDelete.retired(spark, dir, "ev3").isEmpty)
    val ts2 = DeferredDelete.reaped(spark, dir, "ev3")
    assert(ts2.map(_.path).toSet === paths)
    assert(ts2.map(_.path).distinct.size === ts2.size, s"dup tombstones: $ts2")
    assert(ts2.forall(_.reapedAtMs === 4000L)) // superseded, not appended

    // and a further reap is a clean no-op on the converged state
    assert(DeferredDelete.reap(spark, dir, "ev3", nowMs = 5000L,
      maxSkewMs = 0L) === ((Seq.empty, Seq.empty)))
    assert(DeferredDelete.reaped(spark, dir, "ev3") === ts2)
    assert(manifest.exists()) // truncation writes an empty manifest, not rm
  }

  test("unparseable lease tombstone: retained past the primary horizon, " +
      "GC'd by file age at the secondary one (r14 advice)") {
    val dir = Files.createTempDirectory("flyq-deferred-torn").toString
    val leases = new java.io.File(s"$dir/topic_evt/_leases")
    assert(leases.mkdirs())
    val torn = new java.io.File(leases, "deadbeef.released")
    // a torn write on a non-atomic store: content with no released_ms
    java.nio.file.Files.write(torn.toPath,
      """{"released_""".getBytes("UTF-8"))
    // primary horizon long past the (synthetic) release time, file mtime
    // recent: the conservative rule must RETAIN it
    DeferredDelete.reap(spark, dir, "evt", nowMs = 100000L,
      maxSkewMs = 0L, tombstoneHorizonMs = 1000L)
    assert(torn.exists(),
      "a fresh unparseable tombstone must survive the primary horizon")
    // age the FILE past the secondary horizon (4x the tombstone window):
    // modification time is a bound no torn content can fake newer
    java.nio.file.Files.setLastModifiedTime(torn.toPath,
      java.nio.file.attribute.FileTime.fromMillis(0L))
    DeferredDelete.reap(spark, dir, "evt", nowMs = 100000L,
      maxSkewMs = 0L, tombstoneHorizonMs = 1000L)
    assert(!torn.exists(),
      "an unparseable tombstone must not leak forever — file-age GC")
  }

  test("Retention.compact honors the retired manifest: a lease-protected " +
      "retired segment is never hard-deleted (r17 lifecycle review #1)") {
    val dir = Files.createTempDirectory("flyq-compact-retired").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(400)
      .select($"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"), $"event_id")
    Broker.produce(ev, dir, "cr", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 1)
    // a reader holds the pre-retirement view
    val lease = DeferredDelete.acquireLease(spark, dir, "cr",
      holder = "reader", ttlMs = 1000000L, nowMs = 1000L)
    val retired = DeferredDelete.compactDeferred(spark, dir, "cr",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L,
      retireAtMs = 2000L).filterNot(_.keep)
    assert(retired.nonEmpty)
    // the broker-binary composition (Maintenance.Runner) runs the
    // IMMEDIATE compact on the same topic: it must leave the retired,
    // lease-gated files alone — their lifecycle belongs to reap
    val decisions = Retention.compact(spark, dir, "cr",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L)
    assert(decisions.forall(d => !retired.exists(_.path == d.path)),
      "retired segments must be outside compact's planning universe")
    retired.foreach { d =>
      assert(Files.exists(Paths.get(new java.net.URI(d.path))),
        s"compact hard-deleted a retired, lease-protected segment: ${d.path}")
    }
    DeferredDelete.releaseLease(spark, dir, "cr", lease)
  }

  test("compactDeferred's default retirement timestamp is the wall clock " +
      "so real leases actually gate the reap (r17 lifecycle review #2)") {
    val dir = Files.createTempDirectory("flyq-default-retire").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(400)
      .select($"user_id".cast("string").cast("binary").as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"), $"event_id")
    Broker.produce(ev, dir, "rd", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = 1)
    // a real reader on a real clock, acquired BEFORE the retirement
    val t0 = System.currentTimeMillis()
    val lease = DeferredDelete.acquireLease(spark, dir, "rd",
      holder = "real-reader", ttlMs = 10 * 60 * 1000L, nowMs = t0)
    val evicted = DeferredDelete.compactDeferred(spark, dir, "rd",
      retentionMs = Long.MaxValue / 4, retentionBytes = 1L).filterNot(_.keep)
    val t1 = System.currentTimeMillis()
    assert(evicted.nonEmpty)
    DeferredDelete.retired(spark, dir, "rd").foreach { e =>
      assert(e.retiredAtMs >= t0 && e.retiredAtMs <= t1,
        s"default retiredAtMs must be the job's wall clock, got ${e.retiredAtMs}")
    }
    // with the old literal-0 default, acquiredMs <= 0 + skew was false
    // for every real lease and this reap would have unlinked everything
    val (deleted, held) = DeferredDelete.reap(spark, dir, "rd",
      nowMs = System.currentTimeMillis())
    assert(deleted.isEmpty && held.size === evicted.size,
      "a live pre-retirement lease must gate the reap under default clocks")
    DeferredDelete.releaseLease(spark, dir, "rd", lease)
  }

  test("a crashed reader's long-expired lease file is force-released once " +
      "past the tombstone horizon (r17 lifecycle review #8)") {
    val dir = Files.createTempDirectory("flyq-lease-gc").toString
    Files.createDirectories(Paths.get(dir, "topic_lg"))
    val now = System.currentTimeMillis()
    // crashed 8 days ago with a 1 s TTL — expired far beyond the horizon
    val id = DeferredDelete.acquireLease(spark, dir, "lg",
      holder = "crashed", ttlMs = 1000L, nowMs = now - 8L * 86400000L)
    val leaseFile = Paths.get(dir, "topic_lg", "_leases", s"$id.json")
    assert(Files.exists(leaseFile))
    DeferredDelete.reap(spark, dir, "lg", nowMs = now)
    assert(!Files.exists(leaseFile),
      "an expired-beyond-horizon lease file must be force-released, not " +
        "listed and parsed by every future reap forever")
    // tombstone-first protocol: a leaked heartbeat sees the release
    assert(!DeferredDelete.renewLease(spark, dir, "lg", id, 1000L, now),
      "a force-released lease must not be renewable")
    // a RECENTLY expired lease is NOT swept (the skew/renew grace)
    val id2 = DeferredDelete.acquireLease(spark, dir, "lg",
      holder = "recent", ttlMs = 1000L, nowMs = now - 5000L)
    DeferredDelete.reap(spark, dir, "lg", nowMs = now)
    assert(Files.exists(Paths.get(dir, "topic_lg", "_leases", s"$id2.json")),
      "a recently-expired lease stays (renewable within the grace window)")
  }
}
