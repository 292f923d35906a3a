package graft.protocol

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** The reference's request/response payload codecs (§2.6 of SURVEY.md) —
  * the full opcode surface of `flyq-protocol/src/request/` and
  * `response/`, re-expressed with a shared bounds-checked reader
  * instead of hand-rolled length checks per codec.
  *
  * All integers big-endian. Layout citations:
  *  - ProduceRequest          `request/produce.rs:10-39`
  *  - ConsumeRequest          `request/consume.rs:11-40`
  *  - ConsumeWithGroupRequest `request/consume_with_group.rs:13-60`
  *  - CommitOffsetRequest     `request/commit_offset.rs:13-54`
  *  - WatermarkRequest        `request/watermark.rs:10-39`
  *  - ConsumerLagRequest      `request/consumer_lag.rs:10-95` (optional
  *    topic list behind a presence byte; 0 = "all subscribed")
  *  - PartitionHealthRequest  `request/partition_health.rs:10-39`
  *  - ProduceAck              `response/produce_ack.rs:10-27`
  *  - ConsumeResponse         `response/consume_response.rs:11-34` (the
  *    echoed offset prefix + a length-prefix-less message body — the
  *    "echoes the requested offset" quirk lives in the server, not here)
  *  - WatermarkResponse       `response/watermark_response.rs:11-36`
  *    (serialized low, high, log_end)
  *  - ConsumerLagResponse     `response/consumer_lag_response.rs:20-108`
  *  - PartitionHealthResponse `response/partition_health_response.rs:16-101`
  *    (optional last_cleanup behind a presence byte)
  *
  * Like [[Frame]], these exist for protocol parity and the live-socket
  * surfaces ([[graft.sources.v2.FlyqSocketSource]],
  * [[graft.streaming.SocketProduce]], [[FlyqServer]]); the relational
  * query surface never touches them. The reference's 1-byte
  * `ResponsePayload` envelope (`payload.rs:42-47`) is NOT modeled as a
  * codec here: the engine-semantics server answers with the bare
  * response body, and the quirk-compat client/server add/strip the
  * envelope byte inline (see [[FlyqClient]]'s quirk scaladoc).
  */
object Payloads {

  /** Opcode registry (`flyq-protocol/src/op_code.rs:5-13`). */
  object OpCode {
    val Produce: Byte = 1
    val Consume: Byte = 2
    val ConsumeWithGroup: Byte = 3
    val CommitOffset: Byte = 4
    val Watermark: Byte = 5
    val GetConsumerLag: Byte = 13
    val GetPartitionHealth: Byte = 14
    val all: Set[Byte] = Set(Produce, Consume, ConsumeWithGroup, CommitOffset,
      Watermark, GetConsumerLag, GetPartitionHealth)
  }

  /** Request envelope: [op_code u8][payload] (`payload.rs:19-28`). */
  final case class RequestPayload(opCode: Byte, data: Array[Byte])
  object RequestPayload {
    def encode(p: RequestPayload): Array[Byte] = {
      val out = new Array[Byte](1 + p.data.length)
      out(0) = p.opCode
      System.arraycopy(p.data, 0, out, 1, p.data.length)
      out
    }
    def decode(bytes: Array[Byte]): Either[String, RequestPayload] =
      if (bytes.isEmpty) Left("empty request payload")
      else if (!OpCode.all.contains(bytes(0))) Left(s"unknown op_code ${bytes(0)}")
      else Right(RequestPayload(bytes(0), bytes.drop(1)))
  }

  // ---- bounds-checked reader (the codecs' shared error discipline) ----

  private final class Reader(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes)
    def u8(): Either[String, Int] =
      if (buf.remaining() < 1) Left("truncated: expected u8")
      else Right(buf.get() & 0xff)
    def u32(): Either[String, Long] =
      if (buf.remaining() < 4) Left("truncated: expected u32")
      else Right(buf.getInt.toLong & 0xffffffffL)
    def u64(): Either[String, Long] =
      if (buf.remaining() < 8) Left("truncated: expected u64")
      else Right(buf.getLong)
    def blob(len: Long, what: String): Either[String, Array[Byte]] =
      if (len < 0 || len > buf.remaining())
        Left(s"truncated: $what length $len exceeds ${buf.remaining()} remaining")
      else { val a = new Array[Byte](len.toInt); buf.get(a); Right(a) }
    def string(what: String): Either[String, String] = for {
      len <- u32()
      b <- blob(len, what)
      s <- decodeUtf8(b, what)
    } yield s
    def rest(): Array[Byte] = {
      val a = new Array[Byte](buf.remaining()); buf.get(a); a
    }
    def atEnd: Boolean = buf.remaining() == 0
    /** Bound an attacker-controlled element count by the bytes that could
      * possibly hold it — without this, a corrupt count of 0xFFFFFFFF
      * would spin ~4.3e9 fold iterations before failing. */
    def boundedCount(n: Long, minElemBytes: Int, what: String): Either[String, Long] =
      if (n < 0 || n > buf.remaining().toLong / minElemBytes)
        Left(s"implausible $what count $n for ${buf.remaining()} remaining bytes")
      else Right(n)
  }

  private def decodeUtf8(b: Array[Byte], what: String): Either[String, String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try Right(dec.decode(ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException =>
      Left(s"invalid UTF-8 in $what") }
  }

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Writer = { out.write(v & 0xff); this }
    def u32(v: Long): Writer = {
      out.write(ByteBuffer.allocate(4).putInt((v & 0xffffffffL).toInt).array()); this
    }
    def u64(v: Long): Writer = {
      out.write(ByteBuffer.allocate(8).putLong(v).array()); this
    }
    def blob(b: Array[Byte]): Writer = { out.write(b); this }
    def string(s: String): Writer = {
      val b = s.getBytes(StandardCharsets.UTF_8); u32(b.length.toLong); blob(b)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  // ---- requests ----

  final case class ProduceRequest(topic: String, message: Array[Byte])
  object ProduceRequest {
    def encode(r: ProduceRequest): Array[Byte] =
      new Writer().string(r.topic).u32(r.message.length.toLong)
        .blob(r.message).bytes
    def decode(b: Array[Byte]): Either[String, ProduceRequest] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        mlen <- in.u32()
        msg <- in.blob(mlen, "message")
      } yield ProduceRequest(topic, msg)
    }
  }

  final case class ConsumeRequest(topic: String, partition: Long, offset: Long)
  object ConsumeRequest {
    def encode(r: ConsumeRequest): Array[Byte] =
      new Writer().string(r.topic).u32(r.partition).u64(r.offset).bytes
    def decode(b: Array[Byte]): Either[String, ConsumeRequest] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        part <- in.u32()
        off <- in.u64()
      } yield ConsumeRequest(topic, part, off)
    }
  }

  final case class ConsumeWithGroupRequest(topic: String, partition: Long,
                                           group: String)
  object ConsumeWithGroupRequest {
    def encode(r: ConsumeWithGroupRequest): Array[Byte] =
      new Writer().string(r.topic).u32(r.partition).string(r.group).bytes
    def decode(b: Array[Byte]): Either[String, ConsumeWithGroupRequest] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        part <- in.u32()
        group <- in.string("group")
      } yield ConsumeWithGroupRequest(topic, part, group)
    }
  }

  final case class CommitOffsetRequest(topic: String, partition: Long,
                                       group: String, offset: Long)
  object CommitOffsetRequest {
    def encode(r: CommitOffsetRequest): Array[Byte] =
      new Writer().string(r.topic).u32(r.partition).string(r.group)
        .u64(r.offset).bytes
    def decode(b: Array[Byte]): Either[String, CommitOffsetRequest] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        part <- in.u32()
        group <- in.string("group")
        off <- in.u64()
      } yield CommitOffsetRequest(topic, part, group, off)
    }
  }

  final case class WatermarkRequest(topic: String, partition: Long)
  object WatermarkRequest {
    def encode(r: WatermarkRequest): Array[Byte] =
      new Writer().string(r.topic).u32(r.partition).bytes
    def decode(b: Array[Byte]): Either[String, WatermarkRequest] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        part <- in.u32()
      } yield WatermarkRequest(topic, part)
    }
  }

  final case class ConsumerLagRequest(consumerGroup: String,
                                      topics: Option[Seq[String]])
  object ConsumerLagRequest {
    def encode(r: ConsumerLagRequest): Array[Byte] = {
      val w = new Writer().string(r.consumerGroup)
      r.topics match {
        case Some(ts) =>
          w.u8(1).u32(ts.length.toLong)
          ts.foreach(w.string)
        case None => w.u8(0)
      }
      w.bytes
    }
    def decode(b: Array[Byte]): Either[String, ConsumerLagRequest] = {
      val in = new Reader(b)
      for {
        group <- in.string("consumer group")
        flag <- in.u8()
        topics <- flag match {
          case 0 => Right(None)
          case 1 =>
            in.u32().flatMap(in.boundedCount(_, 4, "topic")).flatMap { n =>
              (0L until n).foldLeft[Either[String, Vector[String]]](
                Right(Vector.empty)) { (acc, _) =>
                acc.flatMap(v => in.string("topic").map(v :+ _))
              }.map(ts => Some(ts.toSeq))
            }
          case other => Left(s"bad topics presence flag $other")
        }
      } yield ConsumerLagRequest(group, topics)
    }
  }

  final case class PartitionHealthRequest(topic: String, partition: Long)
  object PartitionHealthRequest {
    def encode(r: PartitionHealthRequest): Array[Byte] =
      new Writer().string(r.topic).u32(r.partition).bytes
    def decode(b: Array[Byte]): Either[String, PartitionHealthRequest] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        part <- in.u32()
      } yield PartitionHealthRequest(topic, part)
    }
  }

  // ---- responses ----

  /** Response decodes are STRICT about trailing bytes (r16): a response
    * longer than its codec is a dialect mismatch — most commonly the
    * reference transport's 1-byte opcode envelope hitting an
    * engine-semantics client, where a lenient fixed-width decode would
    * return byte-shifted GARBAGE (e.g. a watermark low of 0x05<<56)
    * instead of an error. Requests stay lenient like the reference's
    * own deserializers. */
  private def strict[T](in: Reader, what: String)(v: T): Either[String, T] =
    if (in.atEnd) Right(v)
    else Left(s"trailing bytes after $what — response dialect mismatch " +
      "(enveloped response to a bare-body client, or vice versa)?")

  final case class ProduceAck(partition: Long, offset: Long)
  object ProduceAck {
    def encode(r: ProduceAck): Array[Byte] =
      new Writer().u32(r.partition).u64(r.offset).bytes
    def decode(b: Array[Byte]): Either[String, ProduceAck] = {
      val in = new Reader(b)
      for {
        part <- in.u32(); off <- in.u64()
        r <- strict(in, "ProduceAck")(ProduceAck(part, off))
      } yield r
    }
  }

  /** Message body on the wire = the StoredRecord encoding minus its
    * [len][offset] prefix (`message.rs:67-71` serialize_for_wire). */
  final case class WireMessage(tsMs: Long, key: Option[Array[Byte]],
                               value: Array[Byte],
                               headers: Seq[(String, Array[Byte])])
  object WireMessage {
    def encode(m: WireMessage): Array[Byte] = {
      val w = new Writer().u64(m.tsMs)
      m.key match {
        case Some(k) if k.nonEmpty => w.u32(k.length.toLong).blob(k)
        case _ => w.u32(0L) // empty and missing key are indistinguishable
      }
      w.u32(m.value.length.toLong).blob(m.value)
      w.u32(m.headers.length.toLong)
      m.headers.foreach { case (k, v) =>
        w.string(k)
        w.u32(v.length.toLong).blob(v)
      }
      w.bytes
    }
    private[Payloads] def decodeFrom(in: Reader): Either[String, WireMessage] =
      for {
        ts <- in.u64()
        klen <- in.u32()
        key <- in.blob(klen, "key")
        vlen <- in.u32()
        value <- in.blob(vlen, "value")
        hn <- in.u32().flatMap(in.boundedCount(_, 8, "header"))
        headers <- (0L until hn).foldLeft[Either[String, Vector[(String, Array[Byte])]]](
          Right(Vector.empty)) { (acc, _) =>
          acc.flatMap { v =>
            for {
              hk <- in.string("header key")
              hvlen <- in.u32()
              hv <- in.blob(hvlen, "header value")
            } yield v :+ (hk -> hv)
          }
        }
      } yield WireMessage(ts, if (key.isEmpty) None else Some(key), value,
        headers.toSeq)
    def decode(b: Array[Byte]): Either[String, WireMessage] =
      decodeFrom(new Reader(b))
  }

  final case class ConsumeResponse(offset: Long, message: WireMessage)
  object ConsumeResponse {
    def encode(r: ConsumeResponse): Array[Byte] =
      new Writer().u64(r.offset).blob(WireMessage.encode(r.message)).bytes
    def decode(b: Array[Byte]): Either[String, ConsumeResponse] = {
      val in = new Reader(b)
      for {
        off <- in.u64()
        msg <- WireMessage.decodeFrom(in)
        r <- strict(in, "ConsumeResponse")(ConsumeResponse(off, msg))
      } yield r
    }
  }

  final case class WatermarkResponse(lowWatermark: Long, highWatermark: Long,
                                     logEndOffset: Long)
  object WatermarkResponse {
    def encode(r: WatermarkResponse): Array[Byte] =
      new Writer().u64(r.lowWatermark).u64(r.highWatermark)
        .u64(r.logEndOffset).bytes
    def decode(b: Array[Byte]): Either[String, WatermarkResponse] = {
      val in = new Reader(b)
      for {
        low <- in.u64(); high <- in.u64(); end <- in.u64()
        r <- strict(in, "WatermarkResponse")(WatermarkResponse(low, high, end))
      } yield r
    }
  }

  final case class PartitionLag(topic: String, partition: Long,
                                committedOffset: Long, highWatermark: Long,
                                lag: Long)
  final case class ConsumerLagResponse(consumerGroup: String, totalLag: Long,
                                       partitions: Seq[PartitionLag])
  object ConsumerLagResponse {
    def encode(r: ConsumerLagResponse): Array[Byte] = {
      val w = new Writer().string(r.consumerGroup).u64(r.totalLag)
        .u32(r.partitions.length.toLong)
      r.partitions.foreach { p =>
        w.string(p.topic).u32(p.partition).u64(p.committedOffset)
          .u64(p.highWatermark).u64(p.lag)
      }
      w.bytes
    }
    def decode(b: Array[Byte]): Either[String, ConsumerLagResponse] = {
      val in = new Reader(b)
      for {
        group <- in.string("consumer group")
        total <- in.u64()
        n <- in.u32().flatMap(in.boundedCount(_, 32, "partition-lag"))
        parts <- (0L until n).foldLeft[Either[String, Vector[PartitionLag]]](
          Right(Vector.empty)) { (acc, _) =>
          acc.flatMap { v =>
            for {
              topic <- in.string("topic")
              part <- in.u32()
              committed <- in.u64()
              hwm <- in.u64()
              lag <- in.u64()
            } yield v :+ PartitionLag(topic, part, committed, hwm, lag)
          }
        }
        r <- strict(in, "ConsumerLagResponse")(
          ConsumerLagResponse(group, total, parts.toSeq))
      } yield r
    }
  }

  final case class PartitionHealthResponse(topic: String, partition: Long,
                                           segmentCount: Long,
                                           totalSizeBytes: Long,
                                           lowWatermark: Long,
                                           highWatermark: Long,
                                           logEndOffset: Long,
                                           lastCleanup: Option[Long])
  object PartitionHealthResponse {
    def encode(r: PartitionHealthResponse): Array[Byte] = {
      val w = new Writer().string(r.topic).u32(r.partition)
        .u32(r.segmentCount).u64(r.totalSizeBytes).u64(r.lowWatermark)
        .u64(r.highWatermark).u64(r.logEndOffset)
      r.lastCleanup match {
        case Some(ts) => w.u8(1).u64(ts)
        case None => w.u8(0)
      }
      w.bytes
    }
    def decode(b: Array[Byte]): Either[String, PartitionHealthResponse] = {
      val in = new Reader(b)
      for {
        topic <- in.string("topic")
        part <- in.u32()
        segs <- in.u32()
        size <- in.u64()
        low <- in.u64()
        high <- in.u64()
        end <- in.u64()
        flag <- in.u8()
        cleanup <- flag match {
          case 0 => Right(None)
          case 1 => in.u64().map(Some(_))
          case other => Left(s"bad last_cleanup presence flag $other")
        }
        r <- strict(in, "PartitionHealthResponse")(PartitionHealthResponse(
          topic, part, segs, size, low, high, end, cleanup))
      } yield r
    }
  }
}
