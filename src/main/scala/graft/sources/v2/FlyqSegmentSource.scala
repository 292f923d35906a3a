package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.FlyqCodec

/** DataSourceV2 micro-batch source that TAILS a FlyQ topic directory
  * (SURVEY.md §7.2 phase 6): the streaming-source analog of the reference's
  * consume lifecycle, playing the roles of `stream_from_offset` +
  * recovery replay (`partition.rs:144-165`, `segment.rs:188-265`) at the
  * planner level instead of behind a global engine mutex.
  *
  * Offset model: per segment file, the byte position of the last COMPLETE
  * record boundary — `latestOffset` lists files (a metadata-only driver
  * step) and aligns each grown file's delta on a record boundary with a
  * ONE-TASK-PER-FILE Spark job, so a record torn by a mid-append listing
  * is never split across batches or lost; `planInputPartitions` diffs two
  * offsets into (file, startPos, endPos) splits, one task per grown/new
  * segment. A corrupt record freezes the file's offset at the corruption
  * point, mirroring the reference's recovery replay (stop at first parse
  * failure).
  *
  * Scale posture (round-3 verdict #1): the driver never reads data bytes.
  * At 1 000 partitions × 100 MB/s ingest, the old driver-side chain walk
  * re-created the reference's single-funnel mistake (`types.rs:5`, the
  * global engine mutex) at the planner — ~100 GB/s through one process.
  * Now the walk is distributed: the driver's per-trigger cost is
  * O(#files) listing + O(#grown files) task results, exactly like the
  * sampling/listing jobs Spark's own file sources run per batch.
  *
  * Unlike the `binaryFile` stand-in ([[graft.streaming.LogStream]]), this
  * source re-reads NOTHING when a segment grows: only the byte delta is
  * planned, so an active 1 GiB segment receiving appends costs only the new
  * bytes per batch.
  */
class FlyqSegmentSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlyqSegmentSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FlyqSegmentTable(opts.get("path"), Option(opts.get("topic")),
      Option(opts.get("lease.holder")),
      Option(opts.get("lease.ttl.ms")).map(_.toLong)
        .getOrElse(FlyqSegmentSource.DefaultLeaseTtlMs),
      Option(opts.get("fail.on.lost.segments")).forall(_.toBoolean))
  }
}

object FlyqSegmentSource {
  /** Output schema — same shape as SegmentFiles.readTopic / LogStream. */
  val schema: StructType = StructType(Seq(
    StructField("part_id", LongType, nullable = false),
    StructField("base_off", LongType, nullable = false)) ++
    FlyqCodec.recordType.fields)

  val PartitionRe = ".*partition_(\\d+).*".r
  val SegmentRe = ".*segment_(\\d+)\\.log".r
  val TopicSegRe = ".*topic_([^/]+)/partition_(\\d+)/segment_(\\d+)\\.log".r

  /** Default TTL for `lease.holder` streams: generous enough that a
    * stalled trigger doesn't lapse the lease, short enough that a dead
    * stream unpins storage within minutes (the lease renews every
    * trigger, so a live stream never approaches it). */
  val DefaultLeaseTtlMs: Long = 10 * 60 * 1000L
}

class FlyqSegmentTable(path: String, topic: Option[String],
                       leaseHolder: Option[String] = None,
                       leaseTtlMs: Long = FlyqSegmentSource.DefaultLeaseTtlMs,
                       failOnLostSegments: Boolean = true)
    extends Table with SupportsRead {
  require(path != null, "flyq-segments source requires a path")
  override def name(): String = s"flyq-segments(`$path`, topic=$topic)"
  override def schema(): StructType = FlyqSegmentSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FlyqScan(path, topic, leaseHolder, leaseTtlMs, failOnLostSegments)
}

class FlyqScan(path: String, topic: Option[String],
               leaseHolder: Option[String] = None,
               leaseTtlMs: Long = FlyqSegmentSource.DefaultLeaseTtlMs,
               failOnLostSegments: Boolean = true) extends Scan {
  override def readSchema(): StructType = FlyqSegmentSource.schema
  override def description(): String = s"FlyqScan($path)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FlyqMicroBatchStream(path, topic, leaseHolder, leaseTtlMs,
      Option(checkpointLocation), failOnLostSegments)
}

/** Offset = per-file processed byte counts, JSON `{"path":bytes,...}`. */
case class FlyqOffset(fileBytes: Map[String, Long]) extends Offset {
  override def json(): String =
    fileBytes.toSeq.sortBy(_._1).map { case (p, n) =>
      "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + n
    }.mkString("{", ",", "}")
}

object FlyqOffset {
  private val Entry = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\\d+)".r
  def fromJson(json: String): FlyqOffset =
    FlyqOffset(Entry.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2).toLong
    }.toMap)
}

class FlyqMicroBatchStream(path: String, topic: Option[String],
                           leaseHolder: Option[String] = None,
                           leaseTtlMs: Long = FlyqSegmentSource.DefaultLeaseTtlMs,
                           checkpointLocation: Option[String] = None,
                           failOnLostSegments: Boolean = true)
    extends MicroBatchStream {

  /** M2 lease integration (`lease.holder` option): the stream registers
    * itself as a READER of every topic it tails — the distributed Arc
    * handle of [[graft.operators.DeferredDelete]] — so a concurrent
    * retention job's [[graft.operators.DeferredDelete.reap]] cannot
    * unlink a segment this stream planned before retirement. Acquired on
    * first listing, renewed by a daemon HEARTBEAT (quarter-TTL period —
    * trigger-path renewal alone lapses the lease whenever one micro-batch
    * or the trigger interval exceeds the TTL, and a concurrent reap could
    * then unlink mid-read), released in stop().
    *
    * RESTART continuity: the lease id is persisted under the stream's
    * checkpoint dir at acquire time and RE-ADOPTED on restart while the
    * lease file still lives — the restarted stream keeps the ORIGINAL
    * acquire time, so segments retired while it was down (still visible
    * to it through its checkpointed offsets) stay reap-blocked. If the
    * lease lapsed while down, protection DID lapse — a fresh lease is
    * taken and the lost-segment check in [[latestOffset]] is what turns
    * any actual loss into a loud error instead of silent skipping. */
  private val leaseIds = scala.collection.mutable.Map.empty[String, String]
  private val leaseRenewedMs = scala.collection.mutable.Map.empty[String, Long]
  private var heartbeat: Option[java.util.Timer] = None

  private def renewAll(): Unit = leaseIds.synchronized {
    val now = System.currentTimeMillis()
    val lost = leaseIds.filter { case (t, id) =>
      !graft.operators.DeferredDelete
        .renewLease(driverConf, path, t, id, leaseTtlMs, now)
    }.keys.toSeq
    leaseIds.keys.foreach(t => leaseRenewedMs(t) = now)
    // a lease that vanished was released or reaped — renewal must not
    // resurrect it (DeferredDelete.renewLease contract); drop it so the
    // next trigger's ensureLeases re-acquires, and the lost-segment check
    // in latestOffset turns any gap-window loss into a loud error
    lost.foreach { t => leaseIds.remove(t); leaseRenewedMs.remove(t) }
    // keep the checkpointed topic->lease map in sync with reality
    // (ADVICE r13 #2): without this, flyq_leases.json keeps mapping the
    // topic to the dead id until some later ensureLeases change — restart
    // stays correct only because adoption re-validates liveness, but the
    // persisted state would be silently stale in the interim
    if (lost.nonEmpty) persistLeases()
  }

  private def startHeartbeat(): Unit = if (heartbeat.isEmpty) {
    val timer = new java.util.Timer(s"flyq-lease-heartbeat-$path", true)
    val period = math.max(leaseTtlMs / 4, 50L)
    timer.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit =
        try renewAll()
        catch { case scala.util.control.NonFatal(_) => () } // next beat retries
    }, period, period)
    heartbeat = Some(timer)
  }

  // ---- lease persistence across restarts (checkpoint-scoped) ----

  private def leaseStatePath: Option[Path] =
    checkpointLocation.map(c => new Path(s"$c/flyq_leases.json"))

  /** topic -> lease id persisted by a PREVIOUS incarnation of this
    * checkpoint's stream (empty if none). Read once per stream.
    * Raw-fs metadata IO via DeferredDelete's helpers — same
    * ChecksumException-under-concurrent-publish hazard as the lease
    * files themselves. */
  private lazy val persistedLeases: Map[String, String] =
    leaseStatePath.fold(Map.empty[String, String]) { p =>
      graft.operators.DeferredDelete.readMeta(p, driverConf)
        .fold(Map.empty[String, String]) { text =>
          "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
            .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
        }
    }

  private def persistLeases(): Unit = leaseStatePath.foreach { p =>
    val body = leaseIds.toSeq.sortBy(_._1)
      .map { case (t, id) => s""""$t":"$id"""" }.mkString("{", ",", "}")
    graft.operators.DeferredDelete.atomicWriteMeta(p, driverConf,
      body.getBytes("UTF-8"))
  }

  private def ensureLeases(topics: Seq[String]): Unit = leaseHolder.foreach { h =>
    leaseIds.synchronized {
      val now = System.currentTimeMillis()
      var changed = false
      topics.foreach { t =>
        leaseIds.get(t) match {
          case Some(id) =>
            // renew at quarter-TTL cadence, not per trigger: a 0-interval
            // trigger loop would otherwise rewrite the lease file
            // continuously for nothing (the heartbeat covers long gaps)
            if (now - leaseRenewedMs.getOrElse(t, 0L) >= leaseTtlMs / 4) {
              if (!graft.operators.DeferredDelete
                    .renewLease(driverConf, path, t, id, leaseTtlMs, now)) {
                // lease vanished (reaped after a lapse, or released
                // elsewhere) — re-acquire; the lost-segment check in
                // latestOffset turns any gap-window loss into a loud error
                leaseIds(t) = graft.operators.DeferredDelete
                  .acquireLease(driverConf, path, t, h, leaseTtlMs, now)
                changed = true
              }
              leaseRenewedMs(t) = now
            }
          case None =>
            val adopted = persistedLeases.get(t).filter { id =>
              graft.operators.DeferredDelete
                .liveLeases(driverConf, path, t, nowMs = Long.MinValue)
                .exists(_.id == id)
            }
            leaseIds(t) = adopted match {
              // previous incarnation's lease survived the downtime — renew
              // under the SAME id (acquire time preserved, reap stays
              // blocked for everything retired while down); if it vanishes
              // in the race window between the liveness probe above and
              // this renewal, fall through to a fresh acquire
              case Some(id) if graft.operators.DeferredDelete
                  .renewLease(driverConf, path, t, id, leaseTtlMs, now) =>
                id
              case _ =>
                graft.operators.DeferredDelete
                  .acquireLease(driverConf, path, t, h, leaseTtlMs, now)
            }
            leaseRenewedMs(t) = now
            changed = true
        }
      }
      if (changed) persistLeases()
      startHeartbeat()
    }
  }

  /** Session Hadoop conf captured at stream creation (driver) and shipped
    * to readers as a plain map — a fresh `new Configuration()` on the
    * executor would lose fs.defaultFS / s3a credentials and break on any
    * non-local filesystem. */
  private val hadoopConfMap: Map[String, String] = {
    val c = SparkSession.active.sessionState.newHadoopConf()
    c.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  private def driverConf: org.apache.hadoop.conf.Configuration =
    FlyqMicroBatchStream.confFromMap(hadoopConfMap)

  /** One broadcast of the Hadoop conf per stream, shared by the alignment
    * jobs and the reader factory. */
  private lazy val hadoopConfB =
    SparkSession.active.sparkContext.broadcast(hadoopConfMap)

  private def listSegments(): Map[String, Long] = {
    val glob = topic match {
      case Some(t) => s"$path/topic_$t/partition_*/segment_*.log"
      case None => s"$path/topic_*/partition_*/segment_*.log"
    }
    val p = new Path(glob)
    val fs = p.getFileSystem(driverConf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    // M2 (deferred deletion, `segment.rs:336`): segments retired into a
    // topic's `_retired.json` manifest leave every NEW read plan — the
    // streaming analog of the reference's BTreeMap removal — but a
    // segment THIS stream was already tailing (present in lastKnown, i.e.
    // in its checkpointed offsets) stays visible until reaped, the
    // old-reader half of the reference's Arc guarantee: in-flight
    // consumption finishes, only new plans exclude. Matching is by
    // (topic, part, base) parsed from the file name, not by path string,
    // so a scheme difference (file:/ URI here vs the plain path the
    // manifest records) cannot defeat the exclusion. One metadata-file
    // read per topic per trigger, same cost class as the listing itself.
    val topicsSeen = statuses.flatMap(_.getPath.toString match {
      case FlyqSegmentSource.TopicSegRe(t, _, _) => Some(t)
      case _ => None
    }).distinct
    ensureLeases(topicsSeen.toSeq)
    val retiredKeys: Set[(String, Long, Long)] = topicsSeen.flatMap { t =>
      graft.operators.DeferredDelete.retired(SparkSession.active, path, t)
        .map(e => (t, e.partId, e.baseOff))
    }.toSet
    val known = lastKnown
    val live =
      if (retiredKeys.isEmpty) statuses
      else statuses.filter { st =>
        st.getPath.toString match {
          case p @ FlyqSegmentSource.TopicSegRe(t, part, base) =>
            // the already-tailing exemption must also match LEGACY
            // checkpoint keys (scheme-stripped paths) — planInputPartitions
            // already falls back this way; without the same fallback here
            // a retired segment tailed under a legacy checkpoint would
            // lose the exemption and its remaining bytes would be skipped
            !retiredKeys((t, part.toLong, base.toLong)) ||
              known.contains(p) || known.contains(new Path(p).toUri.getPath)
          case _ => true
        }
      }
    // full URI string so the executor resolves the same filesystem
    live.map(s => s.getPath.toString -> s.getLen).toMap
  }

  @volatile private var lastKnown: Map[String, Long] = Map.empty

  override def initialOffset(): Offset = FlyqOffset(Map.empty)

  /** Listing on the driver (metadata only); boundary alignment of each
    * grown file's byte delta on EXECUTORS, one task per file. */
  /** Classify every file this stream was tailing that has VANISHED from
    * the listing (r12 advice #1: the silent-drop path). A vanished file is
    * fine only when the deferred-deletion protocol can prove it was fully
    * consumed: its reap tombstone records the final size and our
    * checkpointed boundary has reached it. Anything else — reaped with
    * unconsumed bytes (lease lapsed while the stream was down), or gone
    * with no tombstone at all (external deletion / non-deferred retention)
    * — is data loss and FAILS the stream instead of silently dropping the
    * offset entry. */
  private def checkVanished(sizes: Map[String, Long],
                            known: Map[String, Long]): Unit = {
    val listed = sizes.keySet
    val listedLegacy = listed.map(p => new Path(p).toUri.getPath)
    val vanished = known.keys.filterNot(k =>
      listed(k) || listedLegacy(k) || listedLegacy(new Path(k).toUri.getPath))
    if (vanished.isEmpty) return
    val tombs = vanished.flatMap(_ match {
      case FlyqSegmentSource.TopicSegRe(t, _, _) => Some(t)
      case _ => None
    }).toSeq.distinct.flatMap { t =>
      graft.operators.DeferredDelete.reaped(driverConf, path, t)
        .map(e => (t, e.partId, e.baseOff) -> e.sizeBytes)
    }.toMap
    vanished.foreach { file =>
      val consumed = known(file)
      file match {
        case FlyqSegmentSource.TopicSegRe(t, part, base) =>
          tombs.get((t, part.toLong, base.toLong)) match {
            case Some(size) if size >= 0 && consumed >= size =>
              () // fully consumed before the reap — the normal lifecycle
            case Some(size) =>
              throw new IllegalStateException(
                s"flyq-segments: segment $file was reaped with unconsumed " +
                s"bytes (consumed $consumed of $size). The stream's lease " +
                "lapsed while it was down (lease.ttl.ms shorter than the " +
                "downtime) — restart from a fresh checkpoint or re-ingest " +
                "the lost range.")
            case None =>
              throw new IllegalStateException(
                s"flyq-segments: segment $file disappeared from the " +
                s"listing outside the deferred-deletion protocol " +
                s"(consumed $consumed bytes, no reap tombstone). Use " +
                "DeferredDelete.compactDeferred for retention on tailed " +
                "topics, or pass fail.on.lost.segments=false to tolerate " +
                "external deletions.")
          }
        case _ => () // non-topic layout: no protocol metadata to check
      }
    }
  }

  override def latestOffset(): Offset = {
    val sizes = listSegments()
    val known = lastKnown
    if (failOnLostSegments) checkVanished(sizes, known)
    val grown = sizes.toSeq.collect {
      case (file, size) if size > known.getOrElse(file, 0L) =>
        (file, known.getOrElse(file, 0L), size)
    }
    val aligned: Map[String, Long] =
      if (grown.isEmpty) Map.empty
      else {
        val confB = hadoopConfB
        SparkSession.active.sparkContext
          .parallelize(grown, grown.size)
          .map { case (file, from, size) =>
            val p = new Path(file)
            val fs = p.getFileSystem(FlyqMicroBatchStream.confFromMap(confB.value))
            file -> FlyqAlign.alignedEnd(fs, p, from, size)
          }.collect().toMap
      }
    val next = sizes.map { case (file, _) =>
      file -> aligned.getOrElse(file, known.getOrElse(file, 0L))
    }
    lastKnown = next
    FlyqOffset(next)
  }

  override def deserializeOffset(json: String): Offset = {
    val o = FlyqOffset.fromJson(json)
    // resume: seed the incremental walk from the checkpointed boundaries
    lastKnown = o.fileBytes ++ lastKnown
    o
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = {
    heartbeat.foreach(_.cancel())
    heartbeat = None
    leaseIds.synchronized {
      leaseIds.foreach { case (t, id) =>
        // NonFatal only: swallowing OOM/interrupts here would lose the
        // interrupt flag and mask a dying JVM (r12 advice #3); a failed
        // release is fine — expiry collects the lease
        try graft.operators.DeferredDelete
          .releaseLease(driverConf, path, t, id)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      leaseIds.clear()
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FlyqOffset].fileBytes
    val e = end.asInstanceOf[FlyqOffset].fileBytes
    e.toSeq.sortBy(_._1).flatMap { case (file, endPos) =>
      // fall back to the scheme-stripped key for checkpoints written when
      // offsets were keyed by toUri.getPath — otherwise an upgrade would
      // re-read every file from 0 and duplicate records into the sink
      val legacyKey = new Path(file).toUri.getPath
      val startPos = s.getOrElse(file, s.getOrElse(legacyKey, 0L))
      if (endPos <= startPos) None
      else {
        val partId = file match {
          case FlyqSegmentSource.PartitionRe(p) => p.toLong
          case _ => -1L
        }
        val baseOff = file match {
          case FlyqSegmentSource.SegmentRe(b) => b.toLong
          case _ => -1L
        }
        Some(FlyqInputPartition(file, startPos, endPos, partId, baseOff))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // broadcast once per stream — the conf map (~1000 entries) would
    // otherwise ride every task's serialized closure
    FlyqReaderFactory(hadoopConfB)
}

object FlyqMicroBatchStream {
  def confFromMap(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

/** Executor-side record-boundary alignment (serializable, no stream state). */
object FlyqAlign extends Serializable {

  /** Walk the length-prefix chain over [from, size) and return the last
    * COMPLETE record boundary — offsets only ever advance to record
    * boundaries, so a record torn at listing time (writer mid-append) is
    * simply picked up whole by a later batch instead of being split across
    * two batches and silently lost. A corrupt length (< 28) freezes the
    * boundary at the corruption point — nothing after a damaged record is
    * silently skipped (the reference's recovery also stops at first parse
    * failure, `segment.rs:213-231`). */
  def alignedEnd(fs: FileSystem, p: Path, from: Long, size: Long): Long = {
    if (size <= from) return from
    val in = fs.open(p)
    try {
      // chunked walk: one positioned read per MiB of delta, lengths parsed
      // in memory — a seek per record would turn a 1 GiB delta of small
      // records into millions of filesystem round-trips per trigger
      val chunk = new Array[Byte](1 << 20)
      var pos = from
      var done = false
      while (!done && pos + 4 <= size) {
        val chunkStart = pos
        val want = math.min(chunk.length.toLong, size - chunkStart).toInt
        in.seek(chunkStart)
        in.readFully(chunk, 0, want)
        var inChunk = true
        while (!done && inChunk && pos + 4 <= size) {
          val off = (pos - chunkStart).toInt
          if (off + 4 > want) inChunk = false // refill from pos
          else {
            val recLen = java.nio.ByteBuffer.wrap(chunk, off, 4).getInt
            if (recLen < 28 || pos + 4L + recLen > size) done = true
            else pos += 4L + recLen // may jump past the chunk: refill next
          }
        }
      }
      pos
    } finally in.close()
  }
}

case class FlyqInputPartition(file: String, startPos: Long, endPos: Long,
                              partId: Long, baseOff: Long) extends InputPartition

case class FlyqReaderFactory(
    hadoopConfMap: org.apache.spark.broadcast.Broadcast[Map[String, String]])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new FlyqPartitionReader(p.asInstanceOf[FlyqInputPartition],
      hadoopConfMap.value)
}

/** Streams the byte delta [startPos, endPos) of one segment file record by
  * record — never materializes the whole delta (a > 2 GiB delta would
  * overflow an array), and endPos is always a record boundary (driver
  * alignment), so a clean stop before endPos means corrupt bytes. */
class FlyqPartitionReader(split: FlyqInputPartition,
                          hadoopConfMap: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(split.file)
    val stream = p.getFileSystem(
      FlyqMicroBatchStream.confFromMap(hadoopConfMap)).open(p)
    stream.seek(split.startPos)
    stream
  }
  private var pos = split.startPos
  private var row: InternalRow = _
  private var done = false

  override def next(): Boolean = {
    while (!done && pos + 4 <= split.endPos) {
      try {
        val lenBuf = new Array[Byte](4)
        in.readFully(lenBuf, 0, 4)
        val recLen = java.nio.ByteBuffer.wrap(lenBuf).getInt
        if (recLen < 28 || pos + 4L + recLen > split.endPos) {
          // outer length chain broken — no way to resync; stop. The driver
          // aligned endPos on this same chain, so this is defensive.
          done = true
          return false
        }
        val recBuf = new Array[Byte](4 + recLen)
        System.arraycopy(lenBuf, 0, recBuf, 0, 4)
        in.readFully(recBuf, 4, recLen)
        pos += 4L + recLen
        val (rec, _) = FlyqCodec.decodeRecordAt(recBuf, 0)
        val out = new GenericInternalRow(7)
        out.update(0, split.partId)
        out.update(1, split.baseOff)
        var i = 0
        while (i < 5) {
          out.update(2 + i, rec.get(i, FlyqCodec.recordType.fields(i).dataType))
          i += 1
        }
        row = out
        return true
      } catch {
        case _: java.io.EOFException =>
          done = true
          return false
        case _: IllegalArgumentException | _: java.nio.BufferUnderflowException =>
          // body-corrupt record with a VALID outer length: the length chain
          // lets us resync at the next record, so only this record is lost
          // — without the resync, every later record in the batch would be
          // silently skipped while the offset still advanced past them.
          // (pos was already advanced past this record above.)
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
