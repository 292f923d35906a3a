package graft

import java.io.{BufferedOutputStream, DataInputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.Frame.{Frame => WireFrame, FrameType}
import graft.protocol.Payloads._
import graft.protocol.{Frame, FlyqServer}

/** End-to-end socket lifecycle (round-3 verdict #7): every byte between
  * client and engine goes through the wire codecs — encode ProduceRequest
  * → TCP → Frame decode → dispatch → segment write → ConsumeResponse —
  * mirroring the reference's `listener.rs:23-84` loop. The files the
  * server writes are then read back with the Spark source, proving the
  * socket front door and the analytical read path share one layout. */
class SocketLifecycleSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  private def b(s: String) = s.getBytes("UTF-8")

  /** Minimal blocking client: one frame out, one frame back. */
  private class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    private val in = new DataInputStream(sock.getInputStream)
    private var corr = 0

    def call(opCode: Byte, payload: Array[Byte]): WireFrame = {
      corr += 1
      out.write(Frame.encode(WireFrame(1, FrameType.Request, corr,
        RequestPayload.encode(RequestPayload(opCode, payload)))))
      out.flush()
      val header = new Array[Byte](Frame.HeaderLen)
      in.readFully(header)
      val len = ByteBuffer.wrap(header, 6, 4).getInt
      val buf = new Array[Byte](Frame.HeaderLen + len)
      System.arraycopy(header, 0, buf, 0, Frame.HeaderLen)
      in.readFully(buf, Frame.HeaderLen, len)
      val Right(Some((f, _))) = Frame.decode(buf): @unchecked
      assert(f.correlationId === corr, "response must echo correlation id")
      f
    }
    def close(): Unit = sock.close()
  }

  test("produce -> consume -> commit -> lag, all through the wire") {
    val dir = Files.createTempDirectory("flyq-sock").toString
    val server = new FlyqServer(dir, numPartitions = 2)
    val port = server.start()
    val c = new Client(port)
    try {
      // 6 keyed produces, same key -> same partition, dense offsets
      val acks = (0 until 6).map { i =>
        val msg = WireMessage(1000L + i, Some(b("user-7")), b(s"v$i"), Nil)
        val f = c.call(OpCode.Produce,
          ProduceRequest.encode(ProduceRequest("t", WireMessage.encode(msg))))
        assert(f.frameType === FrameType.Response)
        val Right(ack) = ProduceAck.decode(f.payload): @unchecked
        ack
      }
      val part = acks.head.partition
      assert(acks.map(_.partition).distinct === Seq(part))
      assert(acks.map(_.offset) === (0L until 6L))

      // keyless produces round-robin across both partitions
      val rrParts = (0 until 4).map { i =>
        val msg = WireMessage(2000L + i, None, b(s"rr$i"), Nil)
        val f = c.call(OpCode.Produce,
          ProduceRequest.encode(ProduceRequest("t", WireMessage.encode(msg))))
        val Right(ack) = ProduceAck.decode(f.payload): @unchecked
        ack.partition
      }
      assert(rrParts.toSet === Set(0L, 1L))

      // point consume from offset 2
      val cf = c.call(OpCode.Consume,
        ConsumeRequest.encode(ConsumeRequest("t", part, 2L)))
      val Right(cr) = ConsumeResponse.decode(cf.payload): @unchecked
      assert(cr.offset === 2L)
      assert(new String(cr.message.value, "UTF-8") === "v2")
      assert(cr.message.key.map(new String(_, "UTF-8")) === Some("user-7"))

      // past-end consume -> Error frame, not a hang or a bogus record
      val ef = c.call(OpCode.Consume,
        ConsumeRequest.encode(ConsumeRequest("t", part, 999L)))
      assert(ef.frameType === FrameType.Error)

      // commit offset 4 for "g1", then consume_with_group resumes there
      val kf = c.call(OpCode.CommitOffset,
        CommitOffsetRequest.encode(CommitOffsetRequest("t", part, "g1", 4L)))
      assert(kf.frameType === FrameType.Response)
      val gf = c.call(OpCode.ConsumeWithGroup,
        ConsumeWithGroupRequest.encode(ConsumeWithGroupRequest("t", part, "g1")))
      val Right(gr) = ConsumeResponse.decode(gf.payload): @unchecked
      assert(gr.offset === 4L)

      // watermarks over the wire
      val wf = c.call(OpCode.Watermark,
        WatermarkRequest.encode(WatermarkRequest("t", part)))
      val Right(wm) = WatermarkResponse.decode(wf.payload): @unchecked
      assert(wm.lowWatermark === 0L)
      assert(wm.logEndOffset === wm.highWatermark + 1)

      // consumer lag: committed 4 on `part`, 0 elsewhere
      val lf = c.call(OpCode.GetConsumerLag,
        ConsumerLagRequest.encode(ConsumerLagRequest("g1", Some(Seq("t")))))
      val Right(lag) = ConsumerLagResponse.decode(lf.payload): @unchecked
      val perPart = lag.partitions.map(p => p.partition -> p).toMap
      assert(perPart(part).committedOffset === 4L)
      assert(perPart(part).lag === perPart(part).highWatermark - 4L)
      assert(lag.totalLag === lag.partitions.map(_.lag).sum)

      // partition health: files on disk match what the wire reports
      val hf = c.call(OpCode.GetPartitionHealth,
        PartitionHealthRequest.encode(PartitionHealthRequest("t", part)))
      val Right(health) = PartitionHealthResponse.decode(hf.payload): @unchecked
      assert(health.segmentCount >= 1L)
      assert(health.logEndOffset === wm.logEndOffset)

      // heartbeat keeps the session alive
      assert(c.call(OpCode.Produce, Array[Byte](99)).frameType === FrameType.Error)

      // the socket-written layout IS the Spark source's layout
      val df = graft.sources.SegmentFiles.readTopic(spark, dir, "t")
      assert(df.count() === 10)
      import org.apache.spark.sql.functions._
      val dense = df.filter(col("part_id") === part)
        .select("msg_offset").collect().map(_.getLong(0)).sorted
      assert(dense.take(6).toSeq === (0L until 6L))
    } finally { c.close(); server.stop() }
  }

  test("socket routing matches the bulk path's pmod(xxhash64(key), n)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (0 until 64).map(i => s"user-$i")
    val viaSpark = keys.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k").cast("binary")), lit(4L)).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(FlyqServer.routeKey(b(k), 4) === viaSpark(k),
        s"key $k routes differently on the socket vs the bulk path")
    }
  }

  test("v2 streaming source tails a socket-fed topic live") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-sock-tail").toString
    val ckpt = Files.createTempDirectory("flyq-sock-tail-ckpt").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val c = new Client(server.start())
    def produce(i: Int): Unit =
      c.call(OpCode.Produce, ProduceRequest.encode(ProduceRequest("live",
        WireMessage.encode(WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)))))
    try {
      (0 until 3).foreach(produce)
      val q = spark.readStream
        .format("graft.sources.v2.FlyqSegmentSource")
        .option("topic", "live").load(dir)
        .writeStream.format("memory").queryName("sock_tail")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("sock_tail").count() === 3)
        // live appends to the ACTIVE segment: only the delta is planned
        (3 until 5).foreach(produce)
        q.processAllAvailable()
        val rows = spark.table("sock_tail")
        assert(rows.count() === 5)
        assert(rows.groupBy("msg_offset").count()
          .filter(col("count") > 1).count() === 0, "no re-reads")
      } finally q.stop()
    } finally { c.close(); server.stop() }
  }

  test("server recovers its write head from existing segments") {
    val dir = Files.createTempDirectory("flyq-sock-rec").toString
    val s1 = new FlyqServer(dir, numPartitions = 1)
    val p1 = s1.start()
    val c1 = new Client(p1)
    val msg = WireMessage(1L, Some(b("k")), b("v0"), Nil)
    c1.call(OpCode.Produce,
      ProduceRequest.encode(ProduceRequest("t", WireMessage.encode(msg))))
    c1.close(); s1.stop()

    val s2 = new FlyqServer(dir, numPartitions = 1)
    val c2 = new Client(s2.start())
    try {
      val f = c2.call(OpCode.Produce,
        ProduceRequest.encode(ProduceRequest("t", WireMessage.encode(
          WireMessage(2L, Some(b("k")), b("v1"), Nil)))))
      val Right(ack) = ProduceAck.decode(f.payload): @unchecked
      assert(ack.offset === 1L, "offset continues after restart")
    } finally { c2.close(); s2.stop() }
  }
}
