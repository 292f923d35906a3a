package graft.protocol

import java.nio.ByteBuffer

import net.jpountz.xxhash.XXHashFactory

/** The reference's wire frame (reference `flyq-protocol/src/frame.rs:1-8`):
  *
  * {{{
  * [ version: u8 ][ frame_type: u8 ][ correlation_id: u32 ]
  * [ payload_len: u32 ][ checksum: u32 (xxh32 of payload, seed 0) ]
  * [ payload bytes... ]
  * }}}
  *
  * 14-byte header, big-endian, XXH32 checksum — bit-identical to the
  * reference (xxhash-rust's xxh32 and lz4-java's XXHash32 both implement
  * the standard XXH32). Decode returns None on a partial buffer so a
  * network reader can re-buffer (frame.rs:57-77), and fails on checksum
  * mismatch or unknown frame type.
  *
  * This codec serves the protocol parity tests, [[FlyqServer]] /
  * [[FlyqClient]], and the live-socket ingestion source
  * ([[graft.sources.v2.FlyqSocketSource]], r15); the batch query surface
  * never touches it.
  */
object Frame {

  sealed abstract class FrameType(val id: Byte)
  object FrameType {
    case object Request extends FrameType(1)
    case object Response extends FrameType(2)
    case object Error extends FrameType(3)
    case object Heartbeat extends FrameType(4)
    val all: Seq[FrameType] = Seq(Request, Response, Error, Heartbeat)
    def from(b: Byte): Either[String, FrameType] =
      all.find(_.id == b).toRight(s"unknown frame type $b")
  }

  final case class Frame(version: Byte, frameType: FrameType,
                         correlationId: Int, payload: Array[Byte])

  val HeaderLen = 14

  private val xx = XXHashFactory.fastestJavaInstance().hash32()

  def xxh32(bytes: Array[Byte]): Int = xx.hash(bytes, 0, bytes.length, 0)

  def encode(f: Frame): Array[Byte] = {
    val buf = ByteBuffer.allocate(HeaderLen + f.payload.length)
    buf.put(f.version)
    buf.put(f.frameType.id)
    buf.putInt(f.correlationId)
    buf.putInt(f.payload.length)
    buf.putInt(xxh32(f.payload))
    buf.put(f.payload)
    buf.array()
  }

  /** Right(None) = incomplete buffer, keep reading. Returns the frame and
    * the number of bytes consumed. */
  def decode(bytes: Array[Byte]): Either[String, Option[(Frame, Int)]] = {
    if (bytes.length < HeaderLen) return Right(None)
    val buf = ByteBuffer.wrap(bytes)
    val version = buf.get()
    val ftRaw = buf.get()
    val corr = buf.getInt
    val payloadLen = buf.getInt
    val expected = buf.getInt
    // the reference gets this bound implicitly from usize; a signed-Int read
    // of a corrupt/malicious length must fail the error contract, not throw
    // NegativeArraySizeException (round-1 advice). Long math avoids the
    // HeaderLen + payloadLen overflow for lengths near 2^31.
    if (payloadLen < 0)
      return Left(s"bad payload_len $payloadLen")
    if (bytes.length.toLong < HeaderLen.toLong + payloadLen) return Right(None)
    val payload = new Array[Byte](payloadLen)
    buf.get(payload)
    val actual = xxh32(payload)
    if (actual != expected)
      Left(f"checksum mismatch: expected $expected%08x found $actual%08x")
    else FrameType.from(ftRaw).map(ft =>
      Some((Frame(version, ft, corr, payload), HeaderLen + payloadLen)))
  }
}
