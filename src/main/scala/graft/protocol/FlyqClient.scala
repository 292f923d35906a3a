package graft.protocol

import java.io.{BufferedOutputStream, DataInputStream}
import java.net.Socket
import java.nio.ByteBuffer

import graft.protocol.Frame.{Frame => WireFrame, FrameType}
import graft.protocol.Payloads._

/** Typed client SDK over the wire protocol — the Spark-library twin of the
  * reference's `flyq-client` crate (`flyq-client/src/lib.rs`): one method
  * per opcode, request/response codecs underneath, `Left(message)` for
  * server Error frames. Blocking, one in-flight request per connection
  * (the reference client is synchronous too).
  *
  * `lagAlert` reproduces the monitor example's threshold classification
  * (`flyq-client/examples/monitor.rs:79-85`) client-side, mirroring the
  * relational form in `BrokerOps.lagAlerts`.
  */
class FlyqClient(host: String, port: Int) extends AutoCloseable {

  private val sock = new Socket(host, port)
  private val out = new BufferedOutputStream(sock.getOutputStream)
  private val in = new DataInputStream(sock.getInputStream)
  private var corr = 0

  private def roundTrip(frame: WireFrame): WireFrame = {
    out.write(Frame.encode(frame))
    out.flush()
    val header = new Array[Byte](Frame.HeaderLen)
    in.readFully(header)
    val len = ByteBuffer.wrap(header, 6, 4).getInt
    require(len >= 0 && len <= (1 << 26), s"bad payload_len $len")
    val buf = new Array[Byte](Frame.HeaderLen + len)
    System.arraycopy(header, 0, buf, 0, Frame.HeaderLen)
    in.readFully(buf, Frame.HeaderLen, len)
    Frame.decode(buf) match {
      case Right(Some((f, _))) => f
      case Right(None) => throw new java.io.IOException("short frame")
      case Left(err) => throw new java.io.IOException(err)
    }
  }

  private def call(opCode: Byte, payload: Array[Byte]): Either[String, Array[Byte]] =
    synchronized {
      corr += 1
      val f = roundTrip(WireFrame(1, FrameType.Request, corr,
        RequestPayload.encode(RequestPayload(opCode, payload))))
      if (f.correlationId != corr)
        Left(s"correlation mismatch: sent $corr got ${f.correlationId}")
      else f.frameType match {
        case FrameType.Response => Right(f.payload)
        case FrameType.Error => Left(new String(f.payload, "UTF-8"))
        case t => Left(s"unexpected frame type $t")
      }
    }

  def produce(topic: String, message: WireMessage): Either[String, ProduceAck] =
    call(OpCode.Produce, ProduceRequest.encode(
      ProduceRequest(topic, WireMessage.encode(message))))
      .flatMap(ProduceAck.decode)

  def consume(topic: String, partition: Long,
              offset: Long): Either[String, ConsumeResponse] =
    call(OpCode.Consume, ConsumeRequest.encode(
      ConsumeRequest(topic, partition, offset)))
      .flatMap(ConsumeResponse.decode)

  def consumeWithGroup(topic: String, partition: Long,
                       group: String): Either[String, ConsumeResponse] =
    call(OpCode.ConsumeWithGroup, ConsumeWithGroupRequest.encode(
      ConsumeWithGroupRequest(topic, partition, group)))
      .flatMap(ConsumeResponse.decode)

  def commitOffset(topic: String, partition: Long, group: String,
                   offset: Long): Either[String, ProduceAck] =
    call(OpCode.CommitOffset, CommitOffsetRequest.encode(
      CommitOffsetRequest(topic, partition, group, offset)))
      .flatMap(ProduceAck.decode)

  def watermark(topic: String,
                partition: Long): Either[String, WatermarkResponse] =
    call(OpCode.Watermark, WatermarkRequest.encode(
      WatermarkRequest(topic, partition)))
      .flatMap(WatermarkResponse.decode)

  def consumerLag(group: String, topics: Option[Seq[String]] = None)
      : Either[String, ConsumerLagResponse] =
    call(OpCode.GetConsumerLag, ConsumerLagRequest.encode(
      ConsumerLagRequest(group, topics)))
      .flatMap(ConsumerLagResponse.decode)

  def partitionHealth(topic: String, partition: Long)
      : Either[String, PartitionHealthResponse] =
    call(OpCode.GetPartitionHealth, PartitionHealthRequest.encode(
      PartitionHealthRequest(topic, partition)))
      .flatMap(PartitionHealthResponse.decode)

  def heartbeat(): Boolean = synchronized {
    corr += 1
    roundTrip(WireFrame(1, FrameType.Heartbeat, corr, Array.empty))
      .frameType == FrameType.Heartbeat
  }

  /** Monitor-threshold classification of a group's total lag
    * (`monitor.rs:79-85`: > 1000 → warn, > 100 → notice). */
  def lagAlert(group: String): Either[String, (Long, String)] =
    consumerLag(group).map { r =>
      val sev = if (r.totalLag > 1000) "warn"
                else if (r.totalLag > 100) "notice"
                else "ok"
      (r.totalLag, sev)
    }

  override def close(): Unit = sock.close()
}
