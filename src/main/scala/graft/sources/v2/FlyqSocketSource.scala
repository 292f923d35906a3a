package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.protocol.{FlyqClient, FlyqProtocolException}

/** DataSourceV2 micro-batch source that consumes a LIVE FlyQ socket —
  * the reference's actual ingest boundary (`listener.rs:23-32,86-96`),
  * closing the one §1.3-mapped surface ("Frame/protocol →
  * MicroBatchStream") the segment-file source leaves open: that source
  * tails the broker's FILES; this one speaks the broker's WIRE.
  *
  * Offset model: per-partition next-offset map. `latestOffset` asks the
  * server for each partition's log-end offset (one Watermark RPC per
  * partition per trigger — metadata-only, driver-side);
  * `planInputPartitions` diffs two offset maps into (partition, from,
  * until) splits, one task per advanced partition. Each task opens its
  * OWN connection and walks Consume responses `from until until` — so
  * data bytes never pass through the driver, and partitions drain in
  * parallel (the reference serializes everything behind one listener
  * thread; Spark's parallelism is per-partition here, capped by the
  * single server socket's accept loop).
  *
  * Scale posture: this is the LIVE-TAIL parity slice, not the bulk-load
  * path — produce at fleet scale lands through
  * [[graft.sources.Broker.produce]] (executor-side segment writes) and
  * bulk reads through the file sources. A 1000-executor cluster pointed
  * at ONE broker socket is bottlenecked by the broker, exactly like the
  * reference; the per-batch delta planning keeps Spark's side of the
  * cost proportional to new messages. Measured loopback ceiling in
  * SURVEY §7.16 (r15 verdict #4).
  *
  * Options:
  *  - `host`, `port`, `topic`, `partitions` (default
  *    [[graft.model.LogModel.NumPartitions]]);
  *  - `startingOffsets` = `earliest` (default — replay the retained
  *    log from each partition's low watermark) or `latest` (tail only
  *    post-attach produces; the right mode for a monitoring consumer
  *    attaching to a long-lived broker, r15 verdict #3 — earliest
  *    replays the whole log at one RPC per record);
  *  - `readTimeoutMs` (default 30000): SO_TIMEOUT on every connection,
  *    so a broker that HANGS mid-batch fails the task (and Spark
  *    retries) instead of blocking it forever (r15 advice #4); 0
  *    disables;
  *  - `maxHoldTriggers` (default 120 under quirkCompat, 0 = unbounded
  *    otherwise): fail the stream after this many CONSECUTIVE
  *    latestOffset transport failures instead of holding forever —
  *    see the known-limitation paragraph below;
  *  - `failOnDataLoss` (default true; engine semantics only): planned
  *    offsets that vanish from the broker between planning and read
  *    (retention evicting under the reader) FAIL the task; `false`
  *    logs the lost range and skips it, Kafka-source style. Under
  *    quirkCompat the echoed-offset walk cannot observe a gap, so the
  *    option has no effect there;
  *  - `quirkCompat` (default false): speak the REFERENCE BROKER's
  *    actual transport (r15 verdict #2) — its listener hardcodes
  *    partition 0 on Consume (`listener.rs:122`), echoes the REQUESTED
  *    offset instead of the record's (`listener.rs:125-129`), answers
  *    "nothing there" with an empty payload, and wraps responses in a
  *    1-byte opcode envelope. Under quirkCompat the source therefore
  *    (a) requires `partitions` ≤ 1 — the transport exposes only
  *    partition 0, and asking for more would silently read partition 0
  *    N times; (b) labels each row with the offset it ASKED for and
  *    advances by exactly 1 — with echoed offsets that is the only
  *    sound walk (and it faithfully reproduces the reference's own
  *    mislabeling across retention-trimmed gaps: the server serves the
  *    first surviving record under each asked offset). Without
  *    quirkCompat the source expects engine semantics (this repo's
  *    [[graft.protocol.FlyqServer]] — real offsets, per-partition
  *    consume), which is also what its scaladoc'd claims are scoped to.
  *
  * Error discipline (r15 advice #2): protocol-level server errors
  * (Error frames — e.g. unknown/deleted topic) throw
  * [[graft.protocol.FlyqProtocolException]] and FAIL the stream;
  * transport failures (connect refused/reset/timeout) are
  * `IOException`s and `latestOffset` HOLDS through them at the last
  * known end — a bounced broker comes back, a deleted topic does not.
  *
  * KNOWN LIMITATION under `quirkCompat` (r16 advice #3): that
  * protocol-vs-transport split only holds against a server that
  * answers errors on a live connection. A TRUE reference broker
  * propagates handler errors and DROPS the connection
  * (`listener.rs` `handle_connection`'s `?`), so against it an
  * unknown/deleted topic is indistinguishable on the wire from a
  * transport outage — both are `IOException`s. The hold is therefore
  * BOUNDED: after `maxHoldTriggers` consecutive failed `latestOffset`
  * calls (option, default 120 under quirkCompat, unbounded under
  * engine semantics where the split is sound) the stream fails loudly
  * naming both possible causes, instead of holding forever on a topic
  * that may no longer exist. A restart resumes from the checkpoint, so
  * bouncing a long-dead broker back costs nothing.
  */
class FlyqSocketSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlyqSocketSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val quirk = Option(opts.get("quirkCompat")).exists(_.toBoolean)
    val partitions = Option(opts.get("partitions")).map(_.toInt)
      .getOrElse(if (quirk) 1 else graft.model.LogModel.NumPartitions.toInt)
    if (quirk && partitions > 1)
      throw new IllegalArgumentException(
        "quirkCompat=true supports only partitions=1: the reference " +
          "transport consumes partition 0 regardless of the requested " +
          "partition (listener.rs:122), so N>1 would read partition 0 " +
          "N times")
    val starting =
      Option(opts.get("startingOffsets")).getOrElse("earliest") match {
        case s @ ("earliest" | "latest") => s
        case other => throw new IllegalArgumentException(
          s"startingOffsets must be 'earliest' or 'latest', got '$other'")
      }
    new FlyqSocketTable(
      Option(opts.get("host")).getOrElse("127.0.0.1"),
      Option(opts.get("port")).map(_.toInt).getOrElse(
        throw new IllegalArgumentException(
          "flyq-socket source requires a port option")),
      Option(opts.get("topic")).getOrElse(
        throw new IllegalArgumentException(
          "flyq-socket source requires a topic option")),
      partitions, starting, quirk,
      Option(opts.get("readTimeoutMs")).map(_.toInt).getOrElse(30000),
      // 0 = hold forever. Engine semantics can: a server Error frame
      // already fails the stream, so an IOException IS a transport
      // outage. The quirk wire cannot tell the two apart (class
      // scaladoc), so it gets a bounded hold by default.
      Option(opts.get("maxHoldTriggers")).map(_.toInt)
        .getOrElse(if (quirk) 120 else 0),
      Option(opts.get("failOnDataLoss")).forall(_.toBoolean))
  }
}

object FlyqSocketSource {
  /** Same record shape as the file sources ([[FlyqSegmentSource.schema]]
    * minus base_off, which is a storage-layout fact the wire does not
    * expose). */
  val schema: StructType = StructType(
    StructField("part_id", LongType, nullable = false) +:
      graft.functions.FlyqCodec.recordType.fields)
}

class FlyqSocketTable(host: String, port: Int, topic: String,
                      numPartitions: Int, startingOffsets: String,
                      quirk: Boolean, readTimeoutMs: Int,
                      maxHoldTriggers: Int = 0,
                      failOnDataLoss: Boolean = true)
    extends Table with SupportsRead {
  override def name(): String = s"flyq-socket($host:$port, topic=$topic)"
  override def schema(): StructType = FlyqSocketSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FlyqSocketScan(host, port, topic, numPartitions,
      startingOffsets, quirk, readTimeoutMs, maxHoldTriggers, failOnDataLoss)
}

class FlyqSocketScan(host: String, port: Int, topic: String,
                     numPartitions: Int, startingOffsets: String,
                     quirk: Boolean, readTimeoutMs: Int,
                     maxHoldTriggers: Int = 0,
                     failOnDataLoss: Boolean = true) extends Scan {
  override def readSchema(): StructType = FlyqSocketSource.schema
  override def description(): String = s"FlyqSocketScan($host:$port/$topic)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FlyqSocketMicroBatchStream(host, port, topic, numPartitions,
      startingOffsets, quirk, readTimeoutMs, maxHoldTriggers, failOnDataLoss)
}

/** Offset = per-partition NEXT offset to consume, JSON `{"0":n,...}`. */
case class FlyqSocketOffset(nextOffsets: Map[Long, Long]) extends Offset {
  override def json(): String =
    nextOffsets.toSeq.sortBy(_._1)
      .map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
}

object FlyqSocketOffset {
  private val Entry = "\"(\\d+)\"\\s*:\\s*(\\d+)".r
  def fromJson(json: String): FlyqSocketOffset =
    FlyqSocketOffset(Entry.findAllMatchIn(json)
      .map(m => m.group(1).toLong -> m.group(2).toLong).toMap)
}

class FlyqSocketMicroBatchStream(host: String, port: Int, topic: String,
                                 numPartitions: Int, startingOffsets: String,
                                 quirk: Boolean, readTimeoutMs: Int,
                                 maxHoldTriggers: Int = 0,
                                 failOnDataLoss: Boolean = true)
    extends MicroBatchStream {

  /** Driver-side metadata connection. Recreated once per failed call
    * ([[withClient]]): a broker RESTART kills the socket, and a stream
    * that cached the dead connection would fail every future trigger
    * even though the broker is back (its write heads and committed
    * offsets recover from disk — SocketLifecycleSpec's restart case). */
  @volatile private var clientOpt: Option[FlyqClient] = None

  private def newClient() = new FlyqClient(host, port, quirk, readTimeoutMs)

  private def withClient[T](body: FlyqClient => T): T = synchronized {
    val c = clientOpt.getOrElse {
      val fresh = newClient(); clientOpt = Some(fresh); fresh
    }
    try body(c)
    catch {
      case e: java.io.IOException =>
        // one reconnect attempt: transient (restart) vs gone (propagate)
        try c.close() catch { case _: Exception => () }
        val fresh = newClient()
        clientOpt = Some(fresh)
        body(fresh)
    }
  }

  /** One Watermark RPC per partition; `f` picks which edge. A server
    * Left here is a PROTOCOL error (the broker answered, and said no)
    * — [[FlyqProtocolException]], which [[latestOffset]] deliberately
    * does NOT swallow: a stream holding forever on "unknown topic"
    * with only stderr spam was r15 advice #2. */
  private def offsets(f: graft.protocol.Payloads.WatermarkResponse => Long)
      : FlyqSocketOffset =
    FlyqSocketOffset((0L until numPartitions.toLong).map { p =>
      p -> withClient(_.watermark(topic, p)).fold(
        err => throw new FlyqProtocolException(
          s"watermark($topic, $p) failed: $err"),
        f)
    }.toMap)

  /** Last successfully fetched log-end offsets: [[latestOffset]] HOLDS
    * here through a broker outage (a bounced broker must not kill the
    * stream — the trigger loop polls continuously, so it always hits
    * the down window; with no progress the engine plans empty batches
    * and the next trigger after the broker returns reconnects). Initial
    * offset has no fallback: a stream that cannot reach the broker at
    * START has nothing to tail and should fail loudly. */
  @volatile private var lastKnownEnd: Option[FlyqSocketOffset] = None

  override def initialOffset(): Offset = {
    // partitions-too-low guard (r16 review #4): a `partitions` option
    // below the broker's real count would silently never plan the
    // excess partitions — keys xxh3-routed there would just not arrive
    // while the stream runs green. Best-effort detection at stream
    // start: if partition N (one past our range) has segments on the
    // broker, the option is provably too low. One metadata RPC, engine
    // semantics only (quirkCompat is partition-0-scoped by contract).
    if (!quirk)
      withClient(_.partitionHealth(topic, numPartitions.toLong)) match {
        case Right(h) if h.segmentCount > 0 =>
          throw new FlyqProtocolException(
            s"partitions=$numPartitions but the broker has data in " +
              s"partition $numPartitions for topic '$topic' — raise the " +
              "partitions option to the broker's partition count or " +
              "keyed records will be silently missed")
        case _ => ()
      }
    if (startingOffsets == "latest") offsets(_.logEndOffset)
    else offsets(_.lowWatermark)
  }
  /** Consecutive failed latestOffset calls while holding — the bounded-
    * hold counter (r16 advice #3); any success resets it. */
  @volatile private var consecutiveHolds = 0

  override def latestOffset(): Offset =
    try {
      val o = offsets(_.logEndOffset)
      lastKnownEnd = Some(o)
      consecutiveHolds = 0
      o
    } catch {
      // IOException only: transport outages hold, protocol errors
      // (FlyqProtocolException) propagate and fail the query
      case e: java.io.IOException if lastKnownEnd.isDefined =>
        consecutiveHolds += 1
        if (maxHoldTriggers > 0 && consecutiveHolds >= maxHoldTriggers)
          // the quirk wire cannot distinguish "broker down" from "topic
          // gone" (the reference drops the connection for both — class
          // scaladoc); after this many consecutive failures, holding
          // forever is likelier to be masking the permanent case
          throw new FlyqProtocolException(
            s"broker $host:$port unreachable for $consecutiveHolds " +
              s"consecutive triggers (maxHoldTriggers=$maxHoldTriggers): " +
              "either a long outage or — against a reference broker, " +
              "indistinguishable on the wire — a deleted/unknown topic. " +
              "Failing loudly; restarting the query resumes from the " +
              s"checkpoint. Last error: ${e.getMessage}")
        System.err.println(s"[flyq-socket] broker unreachable, holding " +
          s"at last known offsets ($consecutiveHolds consecutive): " +
          s"${e.getMessage}")
        lastKnownEnd.get
    }
  override def deserializeOffset(json: String): Offset =
    FlyqSocketOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // checkpoint is the ledger

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FlyqSocketOffset].nextOffsets
    val e = end.asInstanceOf[FlyqSocketOffset].nextOffsets
    e.flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from)
        Some(FlyqSocketInputPartition(host, port, topic, p, from, until,
          quirk, readTimeoutMs, failOnDataLoss): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FlyqSocketReaderFactory

  override def stop(): Unit = synchronized {
    clientOpt.foreach(c => try c.close() catch { case _: Exception => () })
    clientOpt = None
  }
}

case class FlyqSocketInputPartition(host: String, port: Int, topic: String,
                                    partId: Long, from: Long, until: Long,
                                    quirk: Boolean, readTimeoutMs: Int,
                                    failOnDataLoss: Boolean = true)
    extends InputPartition

class FlyqSocketReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new FlyqSocketPartitionReader(p.asInstanceOf[FlyqSocketInputPartition])
}

/** Walks Consume responses over [from, until) on its own connection.
  * Engine semantics: the server answers each request with the FIRST
  * record at ≥ the asked offset. Offsets are DENSE (the broker assigns
  * nextOffset += 1 per append), so a served record ABOVE the asked
  * offset means the records in between were evicted between planning
  * and read — retention-under-reader DATA LOSS, exactly the class the
  * segment source's checkVanished throws for. The reader fails loudly
  * (`failOnDataLoss`, default true, mirroring Kafka's option of the
  * same name) instead of silently advancing the checkpoint past
  * planned-but-undelivered records; `failOnDataLoss=false` logs the
  * lost range and skips (r17 protocol review #2 — the old behavior
  * skipped silently, contradicting the loud-failure policy every
  * sibling path enforces). Quirk semantics: the server echoes the
  * asked offset, so the reader labels rows with it and advances by 1 —
  * see the source scaladoc. Either way, an empty "nothing there"
  * answer below the planned end (quirk transport) fails the task — a
  * planned offset the broker cannot serve is a torn tail, and skipping
  * it would silently drop records. The connection carries the
  * configured SO_TIMEOUT, so a hung broker fails the task instead of
  * wedging it (r15 advice #4). */
class FlyqSocketPartitionReader(split: FlyqSocketInputPartition)
    extends PartitionReader[InternalRow] {
  private val client =
    new FlyqClient(split.host, split.port, split.quirk, split.readTimeoutMs)
  private var nextOff = split.from
  private var row: InternalRow = _

  private def warnDataLoss(lostUntil: Long): Unit =
    System.err.println(s"[flyq-socket] WARNING: data loss — offsets " +
      s"[$nextOff, $lostUntil) of ${split.topic}/${split.partId} were " +
      "planned but are no longer on the broker (evicted between " +
      "planning and read); skipping because failOnDataLoss=false")

  override def next(): Boolean = {
    if (nextOff >= split.until) return false
    client.consumeOpt(split.topic, split.partId, nextOff) match {
      case Left(err) =>
        // engine server: "offset N out of range" = NOTHING at >= N on
        // the broker — the whole planned remainder was evicted. With
        // failOnDataLoss=false the user opted into skipping lost
        // ranges, so end the split (warned) instead of failing.
        if (!split.quirk && !split.failOnDataLoss &&
            err.contains("out of range")) {
          warnDataLoss(split.until)
          nextOff = split.until
          return false
        }
        // a Left is a PROTOCOL answer (an Error frame — e.g. the topic
        // was deleted between planning and read), classified like the
        // driver-side offsets() path, not disguised as a transport
        // outage (r16 review #10)
        throw new FlyqProtocolException(
          s"consume(${split.topic}, ${split.partId}, $nextOff) failed " +
            s"(planned until ${split.until}): $err")
      case Right(None) =>
        // quirk transport's "nothing there" BELOW the planned end: the
        // broker cannot serve an offset its own Watermark advertised —
        // a torn/truncated tail. FAIL the task (Spark retries; if the
        // data is really gone the stream dies loudly) rather than end
        // the split: silently skipping planned-but-unread offsets
        // would advance the checkpoint past records that were never
        // delivered, breaking the replay-exactness the engine path
        // enforces by erroring in the same situation.
        throw new java.io.IOException(
          s"consume(${split.topic}, ${split.partId}, $nextOff) returned " +
            s"no message below the planned end ${split.until} — torn or " +
            "truncated broker tail")
      case Right(Some(resp)) =>
        // dense offsets: a served record above the asked offset means
        // [nextOff, resp.offset) no longer exists on the broker (class
        // scaladoc) — never skip it silently
        if (!split.quirk && resp.offset > nextOff) {
          if (split.failOnDataLoss)
            throw new IllegalStateException(
              s"offsets [$nextOff, " +
                s"${math.min(resp.offset, split.until)}) of " +
                s"${split.topic}/${split.partId} were planned but are " +
                "no longer on the broker (retention evicted them — " +
                "either under this batch or below a resumed " +
                "checkpoint); set failOnDataLoss=false to log lost " +
                "ranges and resume from the earliest surviving offset")
          warnDataLoss(math.min(resp.offset, split.until))
        }
        if (resp.offset >= split.until) { nextOff = split.until; return false }
        val m = resp.message
        val headers = new GenericArrayData(m.headers.map { case (k, v) =>
          new GenericInternalRow(Array[Any](UTF8String.fromString(k), v))
        }.toArray[Any])
        row = new GenericInternalRow(Array[Any](
          split.partId, resp.offset, m.tsMs, m.key.orNull, m.value, headers))
        nextOff = resp.offset + 1
        true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = client.close()
}
