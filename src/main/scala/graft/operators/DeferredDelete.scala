package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.model.LogModel

/** M2 — drop-based DEFERRED deletion (reference `segment.rs:336`): in the
  * reference, a segment evicted from the log keeps its file alive until
  * the last in-flight reader drops its `Arc<Segment>` handle — new readers
  * can't reach it (it left the BTreeMap), old readers finish safely. Rust
  * gets this from RAII on an open handle; a distributed engine re-opens
  * files by path per task, so the handle must be an explicit, durable
  * object. The standard distributed analog (Iceberg/Delta expire-snapshots
  * discipline, public practice) is what this implements:
  *
  *  - eviction RETIRES a segment — it is appended to the topic's
  *    `_retired.json` manifest (atomic tmp+rename) and disappears from
  *    every NEW read plan ([[graft.sources.SegmentFiles.readTopic]] and
  *    the server/broker's `segmentBases` both exclude retired segments) —
  *    but the file is NOT unlinked;
  *  - a reader that needs stable segment visibility holds a LEASE
  *    (`_leases/<id>.json`, holder + acquire time + expiry): the
  *    distributed stand-in for the reference's live `Arc` handle, with an
  *    expiry so a crashed reader cannot pin storage forever (the failure
  *    mode RAII never has to answer);
  *  - [[reap]] unlinks a retired segment only when NO live lease predates
  *    its retirement (a lease acquired after retirement never saw the
  *    segment — its read plan already excluded it), then drops the
  *    manifest entry. Idempotent; safe to run on every maintenance tick.
  *
  * Scale shape: manifests and leases are per-topic metadata files
  * (#segments-retired and #readers sized); reads/writes are driver-side
  * and tiny; the unlinks fan out like [[Retention.compact]]'s.
  */
object DeferredDelete {

  /** `sizeBytes` is the segment's size AT retirement — retention only
    * retires sealed (non-active) segments, so this is its final size and
    * a restarted tail can decide "fully consumed" against it long after
    * the file itself is reaped. -1 on entries written before the field
    * existed (treated as unknown → conservative). */
  case class RetiredSegment(path: String, partId: Long, baseOff: Long,
                            retiredAtMs: Long, sizeBytes: Long = -1L)
  case class Lease(id: String, holder: String, acquiredMs: Long,
                   expiresMs: Long)

  /** Tombstone left behind by [[reap]] when it unlinks a retired segment:
    * the only durable record that the file's disappearance was the
    * PROTOCOL's doing (vs external deletion), and the final size a
    * restarted reader compares its checkpointed offset against to
    * distinguish "fully consumed, safe" from "reaped under me, data
    * loss". Trimmed by age at each reap ([[DefaultTombstoneHorizonMs]]). */
  case class ReapedSegment(path: String, partId: Long, baseOff: Long,
                           sizeBytes: Long, reapedAtMs: Long)

  /** How long [[reap]] keeps tombstones of unlinked segments: long enough
    * that any checkpoint a user would realistically restart from can
    * still classify a missing file, short enough that `_reaped.json`
    * stays a metadata file (entries ≈ segments reaped per week). */
  val DefaultTombstoneHorizonMs: Long = 7L * 86400000L

  /** Default clock-skew allowance for [[reap]]: the margin by which the
    * reaper distrusts ITS OWN clock against lease writers'. A lease is
    * treated as live until `expiresMs + maxSkew`, and as predating a
    * retirement up to `retiredAtMs + maxSkew` — both err toward holding
    * the file, never toward unlinking under a live reader. */
  val DefaultMaxSkewMs: Long = 60000L

  private def topicDir(baseDir: String, topic: String) =
    s"$baseDir/topic_$topic"

  // ---- metadata-file IO (manifest / tombstones / leases) ----
  //
  // All graft metadata files go through the RAW (checksum-free) view of
  // the filesystem. On the local fs, the default checksummed
  // LocalFileSystem writes a sidecar `.name.crc` on create, but the
  // atomic tmp+rename PUBLISH path (FileContext / raw rename) does not
  // reliably keep that sidecar in sync with the data file — a reader
  // then dies with ChecksumException on a lease that was just renewed
  // (observed: the v2 heartbeat renewing at quarter-TTL while the spec
  // polled liveLeases). Torn-write protection here comes from the atomic
  // rename, not client-side CRCs, so the raw view loses nothing. Remote
  // stores (HDFS/S3A) are not ChecksumFileSystems — metaFs is the
  // identity there and the FileContext rename keeps its atomicity.

  /** Checksum-free filesystem view for metadata files. */
  private[graft] def metaFs(p: Path,
                     conf: org.apache.hadoop.conf.Configuration)
      : org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** Atomically publish `body` at `dst` (overwrite allowed): write a tmp
    * sibling, then rename over. Readers see the old or the new content,
    * never a torn half-write. */
  private[graft] def atomicWriteMeta(dst: Path,
                              conf: org.apache.hadoop.conf.Configuration,
                              body: Array[Byte]): Unit = {
    val tmp = new Path(dst.toString + ".tmp")
    dst.getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem =>
        val raw = c.getRawFileSystem
        val out = raw.create(tmp, true)
        try out.write(body) finally out.close()
        // POSIX rename(2) replaces an existing dst atomically; the false
        // branch is a portability fallback that keeps correctness (the
        // brief absence window parses as "no file", the conservative read)
        if (!raw.rename(tmp, dst)) {
          raw.delete(dst, false)
          require(raw.rename(tmp, dst), s"metadata publish failed: $dst")
        }
      case _ =>
        val out = dst.getFileSystem(conf).create(tmp, true)
        try out.write(body) finally out.close()
        org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
          .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Full content of metadata file `p`, None if absent (or deleted
    * between the caller's listing and this read — released leases). */
  private[graft] def readMeta(p: Path,
                       conf: org.apache.hadoop.conf.Configuration)
      : Option[String] = {
    val fs = metaFs(p, conf)
    val in =
      try fs.open(p)
      catch { case _: java.io.FileNotFoundException => return None }
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      Some(new String(bos.toByteArray, "UTF-8"))
    } finally in.close()
  }

  // ---- retirement manifest (_retired.json, atomic tmp+rename) ----

  private def manifestPath(baseDir: String, topic: String) =
    new Path(s"${topicDir(baseDir, topic)}/_retired.json")

  /** Current manifest (empty if none). */
  def retired(spark: SparkSession, baseDir: String,
              topic: String): Seq[RetiredSegment] = {
    val p = manifestPath(baseDir, topic)
    val text = readMeta(p, spark.sessionState.newHadoopConf())
      .getOrElse(return Seq.empty)
    // size_bytes optional: manifests written before the field existed
    // parse with sizeBytes = -1 (unknown → readers stay conservative)
    val entry = ("""\{"path":"((?:[^"\\]|\\.)*)","part_id":(\d+),""" +
      """"base_off":(\d+),"retired_at_ms":(\d+)(?:,"size_bytes":(-?\d+))?\}""").r
    entry.findAllMatchIn(text).map { m =>
      RetiredSegment(unescape(m.group(1)), m.group(2).toLong,
        m.group(3).toLong, m.group(4).toLong,
        Option(m.group(5)).map(_.toLong).getOrElse(-1L))
    }.toSeq
  }

  private def escape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) { b += s(i + 1); i += 2 }
      else { b += s(i); i += 1 }
    }
    b.toString
  }

  /** Test hook: rewrite the manifest to an arbitrary entry list —
    * simulates the on-disk state of a reap killed between its tombstone
    * write and the manifest truncation (DeferredDeleteSpec's
    * crash-idempotence case). Not part of the operator surface. */
  private[graft] def restoreManifestForTest(
      spark: SparkSession, baseDir: String, topic: String,
      entries: Seq[RetiredSegment]): Unit =
    writeManifest(spark, baseDir, topic, entries)

  private def writeManifest(spark: SparkSession, baseDir: String,
                            topic: String,
                            entries: Seq[RetiredSegment]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dst = manifestPath(baseDir, topic)
    val body = entries.map { e =>
      s"""{"path":"${escape(e.path)}","part_id":${e.partId},""" +
        s""""base_off":${e.baseOff},"retired_at_ms":${e.retiredAtMs},""" +
        s""""size_bytes":${e.sizeBytes}}"""
    }.mkString("[", ",", "]")
    atomicWriteMeta(dst, conf, body.getBytes("UTF-8"))
  }

  // ---- leases (the distributed Arc handle) ----

  private def leaseDir(baseDir: String, topic: String) =
    new Path(s"${topicDir(baseDir, topic)}/_leases")

  /** Register a reader. Returns the lease id to release later. */
  def acquireLease(spark: SparkSession, baseDir: String, topic: String,
                   holder: String, ttlMs: Long, nowMs: Long): String =
    acquireLease(spark.sessionState.newHadoopConf(), baseDir, topic,
      holder, ttlMs, nowMs)

  /** Conf-based form: lease operations are pure metadata-file writes, so
    * long-lived readers (the v2 streaming source's heartbeat thread) can
    * run them WITHOUT touching a SparkSession — `spark.sessionState` is
    * not safe to race from a background timer during session init. */
  def acquireLease(conf: org.apache.hadoop.conf.Configuration,
                   baseDir: String, topic: String,
                   holder: String, ttlMs: Long,
                   nowMs: Long): String = {
    val dir = leaseDir(baseDir, topic)
    val fs = metaFs(dir, conf)
    fs.mkdirs(dir)
    val id = java.util.UUID.randomUUID().toString
    val p = new Path(dir, s"$id.json")
    // atomic publish like renewLease (r17 lifecycle review #6): a
    // reaper's liveLeases scan racing this create must parse the whole
    // lease or none — a torn half-write parses as NO lease, which is
    // exactly the window in which the skew clause's protection (a lease
    // acquired just after a retirement still blocks it) would be lost
    // and the segment wrongly unlinked. Create-exclusivity is not
    // load-bearing here: the id is a fresh UUID.
    atomicWriteMeta(p, conf,
      (s"""{"holder":"${escape(holder)}","acquired_ms":$nowMs,""" +
        s""""expires_ms":${nowMs + ttlMs}}""").getBytes("UTF-8"))
    id
  }

  /** Extend a live lease's expiry WITHOUT touching its acquire time (the
    * acquire time is the retirement-ordering key [[reap]] compares, so a
    * renewal must not make an old reader look new). */
  def renewLease(spark: SparkSession, baseDir: String, topic: String,
                 id: String, ttlMs: Long, nowMs: Long): Boolean =
    renewLease(spark.sessionState.newHadoopConf(), baseDir, topic, id,
      ttlMs, nowMs)

  /** Push lease `id`'s expiry to `nowMs + ttlMs`. Returns false — WITHOUT
    * recreating the file — when the lease no longer exists (released or
    * reaped): a released lease must stay released, or a leaked heartbeat
    * timer would resurrect it and block reaps forever. The caller decides
    * whether to re-acquire (and must then re-check segment liveness — the
    * protection window had a gap). */
  def renewLease(conf: org.apache.hadoop.conf.Configuration,
                 baseDir: String, topic: String,
                 id: String, ttlMs: Long, nowMs: Long): Boolean = {
    val p = new Path(leaseDir(baseDir, topic), s"$id.json")
    val lease = liveLeases(conf, baseDir, topic, nowMs = Long.MinValue)
      .find(_.id == id)
    if (lease.isEmpty) {
      // Orphan sweep (r14 review): a PRIOR renewal that crashed between
      // its recreating write and its tombstone-check delete leaves the
      // lease file + tombstone COEXISTING — liveLeases skips tombstoned
      // ids, so without this cleanup no later renewal would ever reach
      // the undo and the pair would pin a dir entry forever
      // (gcReleasedTombstones keeps a tombstone while its file exists).
      if (metaFs(p, conf).exists(releasedTombstone(baseDir, topic, id)) &&
          metaFs(p, conf).exists(p))
        metaFs(p, conf).delete(p, false)
      return false
    }
    val (holder, acquiredMs) = (lease.get.holder, lease.get.acquiredMs)
    // atomic publish like writeManifest: a reaper's liveLeases scan
    // running concurrently with a renewal must see the old or the new
    // lease, never a torn half-write (a torn lease parses as NO lease —
    // exactly the window in which it would wrongly unlink)
    atomicWriteMeta(p, conf,
      (s"""{"holder":"${escape(holder)}","acquired_ms":$acquiredMs,""" +
        s""""expires_ms":${nowMs + ttlMs}}""").getBytes("UTF-8"))
    // Close the check-then-write race (ADVICE r13 #1): a concurrent
    // releaseLease between the pre-check and the write above would have
    // deleted the lease file, and the unconditional write just recreated
    // it. Release is two ordered steps — tombstone FIRST, then unlink —
    // so if that interleaving happened, the tombstone is already visible
    // here: undo the recreation and report the lease gone. If the release
    // instead lands entirely after this check, the renewal legitimately
    // won and the release still deletes the file it meant to.
    if (metaFs(p, conf).exists(releasedTombstone(baseDir, topic, id))) {
      metaFs(p, conf).delete(p, false)
      return false
    }
    true
  }

  /** Released-lease tombstone path: written by [[releaseLease]] BEFORE it
    * unlinks the lease file, so "this id was released" is a monotone fact
    * every racing renewal can observe (see [[renewLease]]). GC'd by
    * [[reap]] once older than the tombstone horizon. */
  private def releasedTombstone(baseDir: String, topic: String, id: String) =
    new Path(leaseDir(baseDir, topic), s"$id.released")

  /** Drop a lease (the reader finished — the Arc drop). Missing ids are
    * fine: release after expiry-reap is a no-op, not an error. */
  def releaseLease(spark: SparkSession, baseDir: String, topic: String,
                   id: String): Unit =
    releaseLease(spark.sessionState.newHadoopConf(), baseDir, topic, id)

  def releaseLease(conf: org.apache.hadoop.conf.Configuration,
                   baseDir: String, topic: String, id: String): Unit = {
    val p = new Path(leaseDir(baseDir, topic), s"$id.json")
    // tombstone first (atomic publish), THEN unlink: the ordering is what
    // lets a racing renewLease detect this release after its own write
    atomicWriteMeta(releasedTombstone(baseDir, topic, id), conf,
      s"""{"released_ms":${System.currentTimeMillis()}}""".getBytes("UTF-8"))
    metaFs(p, conf).delete(p, false): Unit
  }

  /** Unexpired leases at `nowMs`. */
  def liveLeases(spark: SparkSession, baseDir: String, topic: String,
                 nowMs: Long): Seq[Lease] =
    liveLeases(spark.sessionState.newHadoopConf(), baseDir, topic, nowMs)

  def liveLeases(conf: org.apache.hadoop.conf.Configuration,
                 baseDir: String, topic: String,
                 nowMs: Long): Seq[Lease] = {
    val dir = leaseDir(baseDir, topic)
    val fs = metaFs(dir, conf)
    if (!fs.exists(dir)) return Seq.empty
    val all = fs.listStatus(dir).toSeq
    // a `.released` tombstone is monotone proof the id was released —
    // even if a racing renewal recreated the lease file, it is DEAD
    // (renewLease undoes such recreations; skipping here makes the reaper
    // correct in the interim window too)
    val released = all.map(_.getPath.getName).filter(_.endsWith(".released"))
      .map(_.stripSuffix(".released")).toSet
    val files = all.filter { st =>
      val n = st.getPath.getName
      n.endsWith(".json") && !released(n.stripSuffix(".json"))
    }
    files.flatMap { st =>
      // readMeta: None = released between the listing and this read
      val text = readMeta(st.getPath, conf).getOrElse("")
      def num(name: String) =
        ("\"" + name + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
          .map(_.group(1).toLong)
      def str(name: String) =
        ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
          .findFirstMatchIn(text).map(m => unescape(m.group(1)))
      for {
        holder <- str("holder")
        acq <- num("acquired_ms")
        exp <- num("expires_ms")
      } yield Lease(st.getPath.getName.stripSuffix(".json"), holder, acq, exp)
    }.filter(_.expiresMs > nowMs)
  }

  /** Drop released-lease tombstones older than `horizonMs` whose lease
    * file is gone (normal case — release unlinks it). Correctness window:
    * deleting a tombstone re-opens the renew/release race ONLY for a
    * renewal whose pre-check predates the release, i.e. a check-to-write
    * span longer than the tombstone's whole lifetime — milliseconds vs
    * the multi-hour horizon. A tombstone whose lease file still EXISTS is
    * kept (that is the raced-recreation state liveLeases must keep
    * masking until the next renewal cleans it up).
    *
    * Also force-releases lease files EXPIRED for more than the horizon
    * (r17 lifecycle review #8): a reader that crashed without
    * releaseLease otherwise leaves its `<id>.json` forever — every
    * future reap lists and parses it, and a leaked heartbeat could
    * later "renew" it as if protection had been continuous. The release
    * goes through [[releaseLease]] (tombstone-first), so a racing
    * renewal observes it exactly like a normal release; a heartbeat
    * that somehow survived its reader 7+ days gets `false` and must
    * re-acquire + re-check liveness, per the renew contract. */
  private def gcReleasedTombstones(
      conf: org.apache.hadoop.conf.Configuration,
      baseDir: String, topic: String, nowMs: Long,
      tombstoneHorizonMs: Long): Unit = {
    val horizonMs = nowMs - tombstoneHorizonMs
    // an unparseable released_ms keeps a tombstone past the primary
    // horizon, but not FOREVER (r14 advice: the conservatism was right,
    // the silent permanent dir-entry leak was not): once the FILE ITSELF
    // is older than several full horizon windows by modification time —
    // a bound no torn write can fake newer — the entry is garbage
    val secondaryHorizonMs = nowMs - UnparseableTombstoneFactor *
      tombstoneHorizonMs
    val dir = leaseDir(baseDir, topic)
    val fs = metaFs(dir, conf)
    if (!fs.exists(dir)) return
    var unparseableKept = 0
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".json")) {
        // crashed-reader sweep: expired beyond the horizon (or
        // unparseable and older than the secondary file-age horizon,
        // the same bound torn tombstones get) → force-release
        val expiresMs = readMeta(st.getPath, conf).flatMap(t =>
          "\"expires_ms\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(t)
            .map(_.group(1).toLong))
        val stale = expiresMs match {
          case Some(exp) => exp < horizonMs
          case None => st.getModificationTime < secondaryHorizonMs
        }
        if (stale)
          releaseLease(conf, baseDir, topic, n.stripSuffix(".json"))
      } else if (n.endsWith(".released")) {
        val releasedMs = readMeta(st.getPath, conf).flatMap(t =>
          "\"released_ms\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(t)
            .map(_.group(1).toLong))
        val leaseGone = !fs.exists(
          new Path(dir, n.stripSuffix(".released") + ".json"))
        // exists(_ < horizon), NOT forall (r14 review): an unparseable
        // released_ms (torn read on a store without atomic rename) must
        // KEEP the tombstone — forall(None) = true would GC it while
        // potentially seconds old, re-opening the renew/release race
        // window the horizon exists to bound
        if (leaseGone && releasedMs.exists(_ < horizonMs))
          fs.delete(st.getPath, false)
        else if (leaseGone && releasedMs.isEmpty) {
          if (st.getModificationTime < secondaryHorizonMs)
            fs.delete(st.getPath, false)
          else unparseableKept += 1
        }
      }
    }
    if (unparseableKept > 0)
      System.err.println(s"[graft-reap] $topic: $unparseableKept lease " +
        "tombstone(s) with unparseable released_ms retained (torn " +
        "write?); each is GC'd by file age once " +
        s"${UnparseableTombstoneFactor}x the tombstone horizon passes")
  }

  /** How many tombstone-horizon windows an UNPARSEABLE released-lease
    * tombstone survives before file-age GC reclaims it (see
    * [[gcReleasedTombstones]]). */
  private[graft] val UnparseableTombstoneFactor = 4L

  // ---- the deferred compact + reap pair ----

  /** [[Retention.compact]] with deferred deletion: evicted segments are
    * RETIRED (manifest append; new read plans exclude them; files stay),
    * watermarks bump exactly as the immediate form does. Returns the
    * decisions (already-retired segments are outside the planning
    * universe, so a second run retires nothing).
    *
    * `retireAtMs` is the retirement timestamp [[reap]] compares lease
    * ACQUIRE times against, so it must live on the same clock domain as
    * the lease writers' (reader wall clocks — the v2 source stamps
    * `System.currentTimeMillis`). Default -1 = the retention job's
    * current wall clock. (The old default of literal 0 made
    * `acquiredMs <= retiredAtMs + maxSkew` false for every real
    * wall-clock lease, so NO lease could ever block the reap — a
    * production trap fixed in the r17 lifecycle review #2.) */
  def compactDeferred(spark: SparkSession, baseDir: String, topic: String,
                      retentionMs: Long = LogModel.RetentionDays * 86400000L,
                      retentionBytes: Long = LogModel.RetentionBytes,
                      nowMs: Option[Long] = None,
                      retireAtMs: Long = -1L): Seq[Retention.SegmentDecision] = {
    val retireAt =
      if (retireAtMs >= 0L) retireAtMs else System.currentTimeMillis()
    val already = retired(spark, baseDir, topic)
    val decisions = Retention.plan(spark, baseDir, topic, retentionMs,
      retentionBytes, nowMs, excludePaths = already.map(_.path).toSet)
    val evicted = decisions.filterNot(_.keep)
    if (evicted.nonEmpty) {
      writeManifest(spark, baseDir, topic,
        already ++ evicted.map(d =>
          RetiredSegment(d.path, d.partId, d.baseOff, retireAt, d.segBytes)))
    }
    decisions.filter(_.keep).groupBy(_.partId).foreach {
      case (partId, kept) =>
        Retention.Meta.write(spark,
          s"${topicDir(baseDir, topic)}/partition_$partId",
          lowWatermark = kept.map(_.baseOff).min,
          highWatermark = kept.map(_.lastOff).max,
          logEndOffset = kept.map(_.lastOff).max + 1)
    }
    decisions
  }

  /** Unlink retired segments no live lease can still see: a lease BLOCKS a
    * retired segment iff it was acquired BEFORE the retirement (readers
    * that came later planned against a manifest that already excluded it).
    * Returns (deleted paths, still-held paths). Idempotent.
    *
    * Clock skew (r12 verdict #4): acquire/expiry times are written by
    * READER processes on THEIR clocks; `nowMs` and `retiredAtMs` come from
    * the reaper/retention job. The reference's `Arc` refcount has no such
    * failure mode, so the distributed analog must buy the safety
    * explicitly: `maxSkewMs` widens BOTH comparisons toward holding —
    * a lease expired by less than the skew is still treated as live, and
    * a lease acquired up to the skew AFTER a retirement still blocks it
    * (its read plan may have been built from a pre-retirement listing on
    * a fast clock). The cost of the margin is only reap LATENCY (a file
    * lives up to maxSkew longer), never extra deletions.
    *
    * Each unlinked segment leaves a TOMBSTONE in `_reaped.json` (path,
    * final size, reap time) so a reader restarting from an old checkpoint
    * can distinguish "file gone because fully-consumed + reaped" from
    * "file gone with bytes I never read" — see
    * [[graft.sources.v2.FlyqMicroBatchStream]]'s lost-segment check.
    * Tombstones older than `tombstoneHorizonMs` are trimmed in the same
    * write. */
  def reap(spark: SparkSession, baseDir: String, topic: String,
           nowMs: Long, maxSkewMs: Long = DefaultMaxSkewMs,
           tombstoneHorizonMs: Long = DefaultTombstoneHorizonMs)
      : (Seq[String], Seq[String]) = {
    gcReleasedTombstones(spark.sessionState.newHadoopConf(), baseDir, topic,
      nowMs, tombstoneHorizonMs)
    val entries = retired(spark, baseDir, topic)
    if (entries.isEmpty) return (Seq.empty, Seq.empty)
    val leases = liveLeases(spark, baseDir, topic, nowMs - maxSkewMs)
    val (held, free) = entries.partition(e =>
      leases.exists(_.acquiredMs <= e.retiredAtMs + maxSkewMs))
    if (free.nonEmpty) {
      val conf = spark.sessionState.newHadoopConf()
      free.foreach { e =>
        val p = new Path(e.path)
        val fs = p.getFileSystem(conf)
        fs.delete(p, false)
        fs.delete(new Path(e.path.replaceAll("\\.log$", ".index")), false)
      }
      // drop prior tombstones for paths re-reaped NOW: a reap that
      // crashed between this write and the manifest truncation below
      // leaves the segment both tombstoned and still-retired; the re-run
      // frees it again, and without the filter the path would carry two
      // tombstone entries forever (crash-idempotence: re-running reap
      // must CONVERGE, spec-pinned in DeferredDeleteSpec)
      val kept = reaped(spark, baseDir, topic)
        .filter(k => k.reapedAtMs >= nowMs - tombstoneHorizonMs &&
          !free.exists(_.path == k.path))
      writeReaped(spark, baseDir, topic, kept ++ free.map(e =>
        ReapedSegment(e.path, e.partId, e.baseOff, e.sizeBytes, nowMs)))
      writeManifest(spark, baseDir, topic, held)
    }
    (free.map(_.path), held.map(_.path))
  }

  // ---- reaped tombstones (_reaped.json, atomic tmp+rename) ----

  private def reapedPath(baseDir: String, topic: String) =
    new Path(s"${topicDir(baseDir, topic)}/_reaped.json")

  /** Tombstones of segments [[reap]] has unlinked (within the horizon). */
  def reaped(spark: SparkSession, baseDir: String,
             topic: String): Seq[ReapedSegment] =
    reaped(spark.sessionState.newHadoopConf(), baseDir, topic)

  def reaped(conf: org.apache.hadoop.conf.Configuration, baseDir: String,
             topic: String): Seq[ReapedSegment] = {
    val p = reapedPath(baseDir, topic)
    val text = readMeta(p, conf).getOrElse(return Seq.empty)
    val entry = ("""\{"path":"((?:[^"\\]|\\.)*)","part_id":(\d+),""" +
      """"base_off":(\d+),"size_bytes":(-?\d+),"reaped_at_ms":(\d+)\}""").r
    entry.findAllMatchIn(text).map { m =>
      ReapedSegment(unescape(m.group(1)), m.group(2).toLong,
        m.group(3).toLong, m.group(4).toLong, m.group(5).toLong)
    }.toSeq
  }

  private def writeReaped(spark: SparkSession, baseDir: String,
                          topic: String,
                          entries: Seq[ReapedSegment]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dst = reapedPath(baseDir, topic)
    val body = entries.map { e =>
      s"""{"path":"${escape(e.path)}","part_id":${e.partId},""" +
        s""""base_off":${e.baseOff},"size_bytes":${e.sizeBytes},""" +
        s""""reaped_at_ms":${e.reapedAtMs}}"""
    }.mkString("[", ",", "]")
    atomicWriteMeta(dst, conf, body.getBytes("UTF-8"))
  }

  /** Retired (partId, baseOff) pairs — the exclusion set for the local
    * `segmentBases` read path (the server/broker's segment listing). */
  def retiredBases(baseDir: String, topic: String): Set[(Long, Long)] = {
    // local-FS fast path (the server runs on one node, like the
    // reference); falls back to empty when the manifest is absent
    val f = new java.io.File(s"${topicDir(baseDir, topic)}/_retired.json")
    if (!f.exists()) return Set.empty
    val text = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    """"part_id":(\d+),"base_off":(\d+)""".r.findAllMatchIn(text)
      .map(m => (m.group(1).toLong, m.group(2).toLong)).toSet
  }
}
