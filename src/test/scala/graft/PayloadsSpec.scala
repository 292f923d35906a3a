package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.Payloads._

/** Wire parity for the §2.6 request/response payload codecs: hand-derived
  * golden bytes (big-endian, per the reference layouts) + roundtrips +
  * the optional-field and error quirks. */
class PayloadsSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("golden bytes: WatermarkRequest / ProduceAck / lag request without topics") {
    assert(WatermarkRequest.encode(WatermarkRequest("t", 3)) ===
      bytes(0, 0, 0, 1, 't', 0, 0, 0, 3))
    assert(ProduceAck.encode(ProduceAck(2, 7)) ===
      bytes(0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 7))
    // topics=None is a single 0 presence byte — "all subscribed"
    assert(ConsumerLagRequest.encode(ConsumerLagRequest("g", None)) ===
      bytes(0, 0, 0, 1, 'g', 0))
  }

  test("request roundtrips") {
    val reqs = Seq(
      ProduceRequest("orders", Array[Byte](1, 2, 3)),
      ConsumeRequest("orders", 3, 42L),
      ConsumeWithGroupRequest("orders", 1, "analytics"),
      CommitOffsetRequest("orders", 2, "analytics", 99L),
      WatermarkRequest("orders", 0),
      PartitionHealthRequest("orders", 7))
    assert(ProduceRequest.decode(ProduceRequest.encode(
      reqs(0).asInstanceOf[ProduceRequest])).toOption.get.topic === "orders")
    assert(ConsumeRequest.decode(ConsumeRequest.encode(
      reqs(1).asInstanceOf[ConsumeRequest])) === Right(reqs(1)))
    assert(ConsumeWithGroupRequest.decode(ConsumeWithGroupRequest.encode(
      reqs(2).asInstanceOf[ConsumeWithGroupRequest])) === Right(reqs(2)))
    assert(CommitOffsetRequest.decode(CommitOffsetRequest.encode(
      reqs(3).asInstanceOf[CommitOffsetRequest])) === Right(reqs(3)))
    assert(WatermarkRequest.decode(WatermarkRequest.encode(
      reqs(4).asInstanceOf[WatermarkRequest])) === Right(reqs(4)))
    assert(PartitionHealthRequest.decode(PartitionHealthRequest.encode(
      reqs(5).asInstanceOf[PartitionHealthRequest])) === Right(reqs(5)))
  }

  test("consumer-lag request: optional topic list roundtrip both ways") {
    val some = ConsumerLagRequest("g", Some(Seq("a", "bb", "ccc")))
    val none = ConsumerLagRequest("g", None)
    assert(ConsumerLagRequest.decode(ConsumerLagRequest.encode(some)) === Right(some))
    assert(ConsumerLagRequest.decode(ConsumerLagRequest.encode(none)) === Right(none))
    // a presence flag outside {0,1} is an error, not a silent None
    val corrupt = ConsumerLagRequest.encode(none)
    corrupt(corrupt.length - 1) = 9
    assert(ConsumerLagRequest.decode(corrupt).isLeft)
  }

  test("consume response: offset prefix + wire message, empty-key quirk") {
    val m = WireMessage(1234L, Some("k".getBytes), "v".getBytes,
      Seq("h1" -> Array[Byte](9)))
    val r = ConsumeResponse(55L, m)
    val back = ConsumeResponse.decode(ConsumeResponse.encode(r)).toOption.get
    assert(back.offset === 55L)
    assert(back.message.tsMs === 1234L)
    assert(back.message.key.map(_.toSeq) === Some("k".getBytes.toSeq))
    assert(back.message.headers.map { case (k, v) => (k, v.toSeq) } ===
      Seq("h1" -> Array[Byte](9).toSeq))
    // empty key encodes as key_len=0 and decodes as None (message.rs:88-92)
    val ek = WireMessage(1L, Some(Array.emptyByteArray), "v".getBytes, Nil)
    assert(WireMessage.decode(WireMessage.encode(ek)).toOption.get.key === None)
  }

  test("watermark + consumer-lag + partition-health response roundtrips") {
    val wm = WatermarkResponse(0L, 9L, 10L)
    assert(WatermarkResponse.decode(WatermarkResponse.encode(wm)) === Right(wm))
    val lag = ConsumerLagResponse("analytics", 12L, Seq(
      PartitionLag("orders", 0, 5L, 11L, 6L),
      PartitionLag("orders", 1, 5L, 11L, 6L)))
    assert(ConsumerLagResponse.decode(ConsumerLagResponse.encode(lag)) === Right(lag))
    // last_cleanup presence byte both ways (partition_health_response.rs)
    val ph0 = PartitionHealthResponse("orders", 1, 3, 4096L, 0L, 9L, 10L, None)
    val ph1 = ph0.copy(lastCleanup = Some(777L))
    assert(PartitionHealthResponse.decode(PartitionHealthResponse.encode(ph0)) === Right(ph0))
    assert(PartitionHealthResponse.decode(PartitionHealthResponse.encode(ph1)) === Right(ph1))
  }

  test("request envelope: opcode byte + payload, unknown opcode rejected") {
    val inner = WatermarkRequest.encode(WatermarkRequest("t", 1))
    val env = RequestPayload.encode(RequestPayload(OpCode.Watermark, inner))
    assert(env(0) === 5)
    val back = RequestPayload.decode(env).toOption.get
    assert(back.opCode === OpCode.Watermark)
    assert(back.data === inner)
    assert(RequestPayload.decode(bytes(99, 0)).isLeft)
    assert(RequestPayload.decode(Array.emptyByteArray).isLeft)
  }

  test("truncated payloads fail with Left, never exceptions") {
    val full = CommitOffsetRequest.encode(
      CommitOffsetRequest("orders", 2, "analytics", 99L))
    (0 until full.length).foreach { n =>
      val r = CommitOffsetRequest.decode(full.take(n))
      assert(r.isLeft, s"prefix of $n bytes")
    }
  }
}
