package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.Payloads._
import graft.protocol.{FlyqClient, FlyqServer}

/** End-to-end socket lifecycle (round-3 verdict #7): every byte between
  * client and engine goes through the wire codecs — the typed
  * [[FlyqClient]] SDK (the reference's `flyq-client` twin) against
  * [[FlyqServer]]'s TCP loop, mirroring `listener.rs:23-84`. The files
  * the server writes are then read back with the Spark source, proving
  * the socket front door and the analytical read path share one layout. */
class SocketLifecycleSpec extends AnyFunSuite {

  lazy val spark = Testing.spark

  private def b(s: String) = s.getBytes("UTF-8")

  test("produce -> consume -> commit -> lag, all through the wire") {
    val dir = Files.createTempDirectory("flyq-sock").toString
    val server = new FlyqServer(dir, numPartitions = 2)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      assert(c.heartbeat())

      // 6 keyed produces, same key -> same partition, dense offsets
      val acks = (0 until 6).map { i =>
        val Right(ack) = c.produce("t",
          WireMessage(1000L + i, Some(b("user-7")), b(s"v$i"), Nil)): @unchecked
        ack
      }
      val part = acks.head.partition
      assert(acks.map(_.partition).distinct === Seq(part))
      assert(acks.map(_.offset) === (0L until 6L))

      // keyless produces round-robin across both partitions
      val rrParts = (0 until 4).map { i =>
        val Right(ack) = c.produce("t",
          WireMessage(2000L + i, None, b(s"rr$i"), Nil)): @unchecked
        ack.partition
      }
      assert(rrParts.toSet === Set(0L, 1L))

      // point consume from offset 2
      val Right(cr) = c.consume("t", part, 2L): @unchecked
      assert(cr.offset === 2L)
      assert(new String(cr.message.value, "UTF-8") === "v2")
      assert(cr.message.key.map(new String(_, "UTF-8")) === Some("user-7"))

      // past-end consume -> server Error frame -> Left, not a bogus record
      assert(c.consume("t", part, 999L).isLeft)

      // commit offset 4 for "g1", then consume_with_group resumes there
      assert(c.commitOffset("t", part, "g1", 4L).isRight)
      val Right(gr) = c.consumeWithGroup("t", part, "g1"): @unchecked
      assert(gr.offset === 4L)

      // watermarks over the wire
      val Right(wm) = c.watermark("t", part): @unchecked
      assert(wm.lowWatermark === 0L)
      assert(wm.logEndOffset === wm.highWatermark + 1)

      // consumer lag: committed 4 on `part`, 0 elsewhere; monitor alert
      val Right(lag) = c.consumerLag("g1", Some(Seq("t"))): @unchecked
      val perPart = lag.partitions.map(p => p.partition -> p).toMap
      assert(perPart(part).committedOffset === 4L)
      assert(perPart(part).lag === perPart(part).highWatermark - 4L)
      assert(lag.totalLag === lag.partitions.map(_.lag).sum)
      val Right((total, sev)) = c.lagAlert("g1"): @unchecked
      assert(total === lag.totalLag)
      assert(sev === "ok") // tiny fixture lag is below both thresholds

      // partition health: files on disk match what the wire reports
      val Right(health) = c.partitionHealth("t", part): @unchecked
      assert(health.segmentCount >= 1L)
      assert(health.logEndOffset === wm.logEndOffset)

      // the socket-written layout IS the Spark source's layout
      val df = graft.sources.SegmentFiles.readTopic(spark, dir, "t")
      assert(df.count() === 10)
      import org.apache.spark.sql.functions._
      val dense = df.filter(col("part_id") === part)
        .select("msg_offset").collect().map(_.getLong(0)).sorted
      assert(dense.take(6).toSeq === (0L until 6L))
    } finally { c.close(); server.stop() }
  }

  test("malformed request payloads get an Error frame, not a dropped connection") {
    import graft.protocol.Frame
    import graft.protocol.Frame.{Frame => WireFrame, FrameType}
    val dir = Files.createTempDirectory("flyq-sock-mal").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val port = server.start()
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val out = sock.getOutputStream
      val in = new java.io.DataInputStream(sock.getInputStream)
      def roundTrip(payload: Array[Byte]): WireFrame = {
        out.write(Frame.encode(WireFrame(1, FrameType.Request, 7, payload)))
        out.flush()
        val header = new Array[Byte](Frame.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 6, 4).getInt
        val buf = new Array[Byte](Frame.HeaderLen + len)
        System.arraycopy(header, 0, buf, 0, Frame.HeaderLen)
        in.readFully(buf, Frame.HeaderLen, len)
        val Right(Some((f, _))) = Frame.decode(buf): @unchecked
        f
      }
      // unknown opcode, truncated ProduceRequest, empty payload — each
      // must come back as an Error frame on a STILL-LIVE connection
      assert(roundTrip(Array[Byte](99, 1, 2)).frameType === FrameType.Error)
      assert(roundTrip(Array[Byte](OpCode.Produce, 0, 0))
        .frameType === FrameType.Error)
      assert(roundTrip(Array.empty[Byte]).frameType === FrameType.Error)
      // connection survived all three: a well-formed request still works
      val ok = roundTrip(RequestPayload.encode(
        RequestPayload(OpCode.Watermark,
          WatermarkRequest.encode(
            WatermarkRequest("t", 0L)))))
      assert(ok.frameType === FrameType.Response)
    } finally { sock.close(); server.stop() }
  }

  test("wire-supplied topic names cannot escape the base directory") {
    val dir = Files.createTempDirectory("flyq-sock-sec").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      for (bad <- Seq("../evil", "..", "a/b", "x\\y", "")) {
        val r = c.produce(bad, WireMessage(1L, None, b("v"), Nil))
        assert(r.isLeft, s"topic '$bad' must be rejected")
        assert(c.consume(bad, 0L, 0L).isLeft)
        assert(c.watermark(bad, 0L).isLeft)
      }
      assert(!Files.exists(java.nio.file.Paths.get(dir).getParent
        .resolve("evil")), "no directory created outside baseDir")
    } finally { c.close(); server.stop() }
  }

  test("empty and escaped group names survive the offsets round-trip") {
    val dir = Files.createTempDirectory("flyq-sock-esc").toString
    val s1 = new FlyqServer(dir, numPartitions = 1)
    val c1 = new FlyqClient("127.0.0.1", s1.start())
    assert(c1.produce("t", WireMessage(1L, None, b("v"), Nil)).isRight)
    assert(c1.commitOffset("t", 0L, "", 1L).isRight)
    assert(c1.commitOffset("t", 0L, """we"ird\grp""", 2L).isRight)
    c1.close(); s1.stop()
    val s2 = new FlyqServer(dir, numPartitions = 1)
    val c2 = new FlyqClient("127.0.0.1", s2.start())
    try {
      val Right(lag) = c2.consumerLag("", Some(Seq("t"))): @unchecked
      assert(lag.partitions.head.committedOffset === 1L)
      val Right(lag2) = c2.consumerLag("""we"ird\grp""", Some(Seq("t"))): @unchecked
      assert(lag2.partitions.head.committedOffset === 2L)
    } finally { c2.close(); s2.stop() }
  }

  test("consume floor-seeks via the sparse index across dense offsets") {
    // small index interval + many records in one partition: every offset
    // must come back exactly, including ones far past an index entry and
    // ones landing exactly ON an entry (boundary of the floor seek)
    val dir = Files.createTempDirectory("flyq-sock-idx").toString
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 1 << 20, indexInterval = 7)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      (0 until 100).foreach { i =>
        assert(c.produce("t",
          WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      for (off <- Seq(0L, 1L, 6L, 7L, 8L, 13L, 14L, 50L, 98L, 99L)) {
        val Right(r) = c.consume("t", 0L, off): @unchecked
        assert(r.offset === off)
        assert(new String(r.message.value, "UTF-8") === s"v$off")
      }
      assert(c.consume("t", 0L, 100L).isLeft)
    } finally { c.close(); server.stop() }
  }

  test("socket routing = bulk Xxh3Partition expression = reference xxh3_64 % n") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (0 until 64).map(i => s"user-$i")
    // the bulk produce path's routing EXPRESSION over the same keys
    val viaSpark = keys.toDF("k")
      .select(col("k"), graft.functions.Xxh3.xxh3_partition(
        col("k").cast("binary"), 4L).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(FlyqServer.routeKey(b(k), 4) === viaSpark(k),
        s"key $k routes differently on the socket vs the bulk path")
    }
    // placement pinned to the reference rule `(hash as u32) % n`
    // (topic.rs:90-93) applied BY HAND to the reference-C golden vectors
    // (Xxh3Spec set) — literal expected partitions, nothing computed from
    // the code under test:
    //   xxh3_64("a") = 0xe6c632b61e964e1f, low32 = 0x1e964e1f
    //     → % 4 = 3, % 7 = 1
    //   xxh3_64("")  = 0x2d06800538d394c2, low32 = 0x38d394c2
    //     → % 4 = 2, % 3 = 0 (full-u64 % 3 would say 1 — separating case)
    //   xxh3_64("orders") = 0xa88ccdc9fa4974fb, low32 = 0xfa4974fb
    //     → % 7 = 5 (full-u64 % 7 would say 1 — separating case)
    assert(FlyqServer.routeKey("a".getBytes("UTF-8"), 4) === 3L)
    assert(FlyqServer.routeKey(Array.emptyByteArray, 4) === 2L)
    // NON-power-of-two counts where the u32-truncate rule and a full-u64
    // remainder provably disagree — the pre-r11 bug fails both of these
    assert(FlyqServer.routeKey(Array.emptyByteArray, 3) === 0L)
    assert(FlyqServer.routeKey("orders".getBytes("UTF-8"), 7) === 5L)
    assert(FlyqServer.routeKey("a".getBytes("UTF-8"), 7) === 1L)
    val via7 = Seq("a", "orders").toDF("k")
      .select(graft.functions.Xxh3.xxh3_partition(
        encode(col("k"), "UTF-8"), 7L))
      .collect().map(_.getLong(0))
    assert(via7(0) === 1L)
    assert(via7(1) === 5L)
  }

  test("v2 streaming source tails a socket-fed topic live") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-sock-tail").toString
    val ckpt = Files.createTempDirectory("flyq-sock-tail-ckpt").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val c = new FlyqClient("127.0.0.1", server.start())
    def produce(i: Int): Unit =
      assert(c.produce("live",
        WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
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

  test("server recovers write head, committed offsets, and meta across restart") {
    val dir = Files.createTempDirectory("flyq-sock-rec").toString
    val s1 = new FlyqServer(dir, numPartitions = 1)
    val c1 = new FlyqClient("127.0.0.1", s1.start())
    (0 until 3).foreach { i =>
      assert(c1.produce("t",
        WireMessage(1L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
    }
    assert(c1.commitOffset("t", 0L, "g1", 2L).isRight)
    c1.close(); s1.stop()

    // clean shutdown snapshots the reference's meta.json watermark triple
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "topic_t", "partition_0", "meta.json")),
      "UTF-8")
    assert(meta.contains("\"log_end_offset\":3"))
    assert(meta.contains("\"high_watermark\":2"))

    val s2 = new FlyqServer(dir, numPartitions = 1)
    val c2 = new FlyqClient("127.0.0.1", s2.start())
    try {
      val Right(ack) = c2.produce("t",
        WireMessage(9L, Some(b("k")), b("v3"), Nil)): @unchecked
      assert(ack.offset === 3L, "offset continues after restart")
      // committed offsets reloaded from consumer_offsets.json
      val Right(gr) = c2.consumeWithGroup("t", 0L, "g1"): @unchecked
      assert(gr.offset === 2L, "group offset survives restart")
    } finally { c2.close(); s2.stop() }
  }

  test("live-socket stream (r14 verdict #6): produced messages arrive as " +
      "a DataFrame; watermarks/lag match the batch twins") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-sock-stream").toString
    val server = new FlyqServer(dir, numPartitions = 2)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    val q = spark.readStream
      .format("graft.sources.v2.FlyqSocketSource")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("topic", "t").option("partitions", "2")
      .load()
      .writeStream.format("memory").queryName("flyq_sock")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("flyq-sock-ckpt").toString)
      .start()
    try {
      // 8 keyed (two keys, deterministic xxh3 routing) + 4 keyless (rr)
      val acks = (0 until 8).map { i =>
        val Right(a) = c.produce("t", WireMessage(3000L + i,
          Some(b(if (i % 2 == 0) "alpha" else "beta")), b(s"m$i"),
          Nil)): @unchecked
        (a.partition, a.offset, 3000L + i, s"m$i")
      } ++ (0 until 4).map { i =>
        val Right(a) = c.produce("t", WireMessage(4000L + i, None,
          b(s"rr$i"), Nil)): @unchecked
        (a.partition, a.offset, 4000L + i, s"rr$i")
      }
      // a committed group for the lag twin
      assert(c.commitOffset("t", 0L, "g", 1L).isRight)
      q.processAllAvailable()
      val got = spark.table("flyq_sock")
      // row-level: every produced message arrives exactly once, with the
      // ack's (partition, offset) and the original payload
      val rows = got.select("part_id", "msg_offset", "ts_ms", "mvalue")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
      assert(rows === acks.toSet)

      // watermark twin #1: the streamed frame's per-partition triple
      // equals the batch FILE source's over the same broker dir (the
      // server writes the layout SegmentFiles reads)
      def wm(df: org.apache.spark.sql.DataFrame) =
        graft.model.LogModel.watermarks(df)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      val streamWm = wm(got)
      val batchWm = wm(
        graft.sources.SegmentFiles.readTopic(spark, dir, "t"))
      assert(streamWm === batchWm)
      // watermark twin #2: and both equal the server's own Watermark RPC
      streamWm.foreach { case (p, low, high, end) =>
        val Right(w) = c.watermark("t", p): @unchecked
        assert((w.lowWatermark, w.highWatermark, w.logEndOffset) ===
          ((low, high, end)), s"partition $p")
      }
      // lag twin: server RPC lag == streamed log_end - committed
      val Right(lag) = c.consumerLag("g"): @unchecked
      val streamEnd = streamWm.find(_._1 == 0L).get._4
      val pl = lag.partitions.find(p => p.topic == "t" && p.partition == 0L).get
      assert(pl.lag === streamEnd - 2L) // committed offset 1 => 2 consumed
      assert(pl.highWatermark === streamEnd - 1L)

      // live tail: later produces arrive as a DELTA batch (the planner
      // diffs offsets; nothing re-read)
      val Right(a2) = c.produce("t", WireMessage(5000L, Some(b("alpha")),
        b("late"), Nil)): @unchecked
      q.processAllAvailable()
      val after = spark.table("flyq_sock")
      assert(after.count() === acks.size + 1)
      assert(after.filter(col("msg_offset") === a2.offset &&
        col("part_id") === a2.partition).count() === 1)
    } finally { q.stop(); c.close(); server.stop() }
  }

  test("socket producer sink: a streaming frame lands on the broker with " +
      "server-side routing; full wire round-trip") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("flyq-sock-produce").toString
    val server = new FlyqServer(dir, numPartitions = 2)
    val port = server.start()
    val input = MemoryStream[(Array[Byte], Array[Byte], Long)](spark)
    val w = graft.streaming.SocketProduce.socketProduceWriter(
        input.toDF().toDF("mkey", "mvalue", "ts_ms"),
        "127.0.0.1", port, "t")
      .option("checkpointLocation",
        Files.createTempDirectory("flyq-sock-produce-ckpt").toString)
      .start()
    try {
      val keyed = (0 until 6).map(i =>
        (b("user-9"), b(s"kv$i"), 7000L + i))
      val keyless = (0 until 4).map(i =>
        (null: Array[Byte], b(s"nk$i"), 8000L + i))
      input.addData(keyed ++ keyless: _*)
      w.processAllAvailable()

      // the broker's files (the same layout every batch source reads)
      // hold all 10 rows; the 6 keyed rows landed on ONE partition
      // (server-side xxh3 routing) with 6 distinct offsets
      val got = graft.sources.SegmentFiles.readTopic(spark, dir, "t")
        .select(col("part_id"), col("msg_offset"), col("ts_ms"),
          col("mvalue").cast("string").as("v"))
        .collect()
      assert(got.length === 10)
      val keyedRows = got.filter(_.getString(3).startsWith("kv"))
      assert(keyedRows.map(_.getLong(0)).distinct.length === 1,
        "keyed rows must route to one partition")
      assert(keyedRows.map(_.getLong(1)).distinct.length === 6)
      assert(got.map(_.getString(3)).toSet ===
        (keyed ++ keyless).map(t => new String(t._2, "UTF-8")).toSet)
      // keyless rows round-robin across both partitions
      assert(got.filter(_.getString(3).startsWith("nk"))
        .map(_.getLong(0)).toSet === Set(0L, 1L))
      // client-supplied timestamps survive the wire
      assert(got.find(_.getString(3) == "kv3").get.getLong(2) === 7003L)

      // full wire round-trip: what the sink produced over TCP, the
      // socket SOURCE streams back, byte-for-byte
      val q = spark.readStream
        .format("graft.sources.v2.FlyqSocketSource")
        .option("host", "127.0.0.1").option("port", port.toString)
        .option("topic", "t").option("partitions", "2")
        .load()
        .writeStream.format("memory").queryName("flyq_rt")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("flyq-rt-ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        val rt = spark.table("flyq_rt")
          .select(col("mvalue").cast("string")).as[String].collect().toSet
        assert(rt === got.map(_.getString(3)).toSet)
      } finally q.stop()
    } finally { w.stop(); server.stop() }
  }

  test("headers round-trip the engine wire: produce -> disk -> consume " +
      "and the socket source's headers column (r16 review #2)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-headers").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      val hdrs = Seq("trace-id" -> b("abc123"), "src" -> b("ingest"))
      assert(c.produce("t", WireMessage(9L, Some(b("k")), b("v0"), hdrs))
        .isRight)
      assert(c.produce("t", WireMessage(10L, Some(b("k")), b("v1"), Nil))
        .isRight)
      // point consume serves the stored headers, not Nil
      val Right(r0) = c.consume("t", 0L, 0L): @unchecked
      assert(r0.message.headers.map { case (k, v) =>
        k -> new String(v, "UTF-8") } ===
        Seq("trace-id" -> "abc123", "src" -> "ingest"))
      val Right(r1) = c.consume("t", 0L, 1L): @unchecked
      assert(r1.message.headers.isEmpty)
      // the group path serves them too
      val Right(g0) = c.consumeWithGroup("t", 0L, "g"): @unchecked
      assert(g0.message.headers.map(_._1) === Seq("trace-id", "src"))

      // and the LIVE SOCKET SOURCE's headers column carries them
      val q = spark.readStream
        .format("graft.sources.v2.FlyqSocketSource")
        .option("host", "127.0.0.1").option("port", port.toString)
        .option("topic", "t").option("partitions", "1").load()
        .writeStream.format("memory").queryName("flyq_hdrs")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("flyq-hdrs-ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        val rows = spark.table("flyq_hdrs")
          .select(col("msg_offset"),
            expr("transform(headers, h -> h.hkey)").as("hkeys"))
          .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        assert(rows(0L) === Seq("trace-id", "src"))
        assert(rows(1L).isEmpty)
      } finally q.stop()
    } finally { c.close(); server.stop() }
  }

  test("torn-tail recovery: a crash mid-append is truncated on restart " +
      "so post-restart acked records stay reachable (r16 review #1)") {
    val dir = Files.createTempDirectory("flyq-torn-rec").toString
    val s1 = new FlyqServer(dir, numPartitions = 1)
    val c1 = new FlyqClient("127.0.0.1", s1.start())
    (0 until 3).foreach { i =>
      assert(c1.produce("t",
        WireMessage(1L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
    }
    c1.close(); s1.stop()
    // simulate the crash: a PARTIAL record at the tail (plausible length
    // prefix, body cut short)
    val seg = java.nio.file.Paths.get(dir, "topic_t", "partition_0")
      .toFile.listFiles().filter(_.getName.endsWith(".log")).head.toPath
    val whole = Files.size(seg)
    val torn = java.nio.ByteBuffer.allocate(12)
    torn.putInt(64); torn.putLong(3L) // claims 64 bytes, delivers 8
    Files.write(seg, torn.array(),
      java.nio.file.StandardOpenOption.APPEND)
    assert(Files.size(seg) === whole + 12)

    val s2 = new FlyqServer(dir, numPartitions = 1)
    val c2 = new FlyqClient("127.0.0.1", s2.start())
    try {
      // the torn bytes were never acked; recovery must reclaim them so
      // the next acked record is REACHABLE through the length chain
      val Right(ack) = c2.produce("t",
        WireMessage(9L, Some(b("k")), b("after"), Nil)): @unchecked
      assert(ack.offset === 3L)
      val Right(r) = c2.consume("t", 0L, 3L): @unchecked
      assert(r.offset === 3L)
      assert(new String(r.message.value, "UTF-8") === "after")
      // pre-crash records are intact
      val Right(r0) = c2.consume("t", 0L, 0L): @unchecked
      assert(new String(r0.message.value, "UTF-8") === "v0")
      // and the file no longer carries the torn prefix between them
      val Right(wm) = c2.watermark("t", 0L): @unchecked
      assert(wm.logEndOffset === 4L)
    } finally { c2.close(); s2.stop() }
  }

  test("consumer lag sees on-disk topics right after a restart, before " +
      "any traffic repopulates the write-head cache (r16 review #5)") {
    val dir = Files.createTempDirectory("flyq-lag-restart").toString
    val s1 = new FlyqServer(dir, numPartitions = 1)
    val c1 = new FlyqClient("127.0.0.1", s1.start())
    (0 until 5).foreach { i =>
      assert(c1.produce("t",
        WireMessage(1L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
    }
    c1.close(); s1.stop()
    val s2 = new FlyqServer(dir, numPartitions = 1)
    val c2 = new FlyqClient("127.0.0.1", s2.start())
    try {
      // no topics argument = "all subscribed"; the group never
      // committed, so memory alone knows nothing — the on-disk layout
      // must supply the topic and the REAL lag, not a green zero
      val Right(lag) = c2.consumerLag("monitor", None): @unchecked
      assert(lag.partitions.map(_.topic).contains("t"),
        s"restarted broker hid its on-disk topic: $lag")
      assert(lag.totalLag === 4L) // high watermark 4, committed 0
    } finally { c2.close(); s2.stop() }
  }

  test("a partitions option below the broker's real count fails the " +
      "stream at start instead of silently missing keys (r16 review #4)") {
    val dir = Files.createTempDirectory("flyq-partlow").toString
    val server = new FlyqServer(dir, numPartitions = 2)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      // land data on BOTH partitions (keyless round-robin)
      (0 until 4).foreach { i =>
        assert(c.produce("t", WireMessage(1L + i, None, b(s"v$i"), Nil))
          .isRight)
      }
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        spark.readStream.format("graft.sources.v2.FlyqSocketSource")
          .option("host", "127.0.0.1").option("port", port.toString)
          .option("topic", "t").option("partitions", "1").load()
          .writeStream.format("memory").queryName("flyq_partlow")
          .option("checkpointLocation",
            Files.createTempDirectory("flyq-partlow-ckpt").toString)
          .start().processAllAvailable()
      }
      assert(causeChain(e).exists(c2 =>
        String.valueOf(c2.getMessage).contains("partitions=1")),
        s"expected the partitions guard, got: $e")
    } finally { c.close(); server.stop() }
  }

  test("quirk transport (r15 verdict #2): the quirk client speaks the " +
      "reference listener's envelope/raw-value/partition-0/echoed-offset " +
      "dialect against the quirk-faithful stub server") {
    val dir = Files.createTempDirectory("flyq-quirk").toString
    val server = new FlyqServer(dir, numPartitions = 1, quirks = true)
    val c = new FlyqClient("127.0.0.1", server.start(), quirk = true)
    try {
      // network produce carries the RAW value; server stamps its own
      // time and stores key=None (listener.rs:91-96)
      val t0 = System.currentTimeMillis()
      val acks = (0 until 5).map { i =>
        val Right(a) = c.produce("t",
          WireMessage(0L, None, b(s"v$i"), Nil)): @unchecked
        a
      }
      assert(acks.map(_.offset) === (0L until 5L))
      // a keyed produce is REFUSED client-side, not silently stripped
      val keyed = c.produce("t", WireMessage(0L, Some(b("k")), b("x"), Nil))
      assert(keyed.isLeft)
      assert(keyed.swap.toOption.get.contains("drops keys"))

      // echoed offset + partition-0 hardcode: asking partition 1 still
      // reads partition 0's log (listener.rs:122), labeled with the
      // ASKED offset (listener.rs:125-129)
      val Right(Some(r1)) = c.consumeOpt("t", 1L, 2L): @unchecked
      assert(r1.offset === 2L)
      assert(new String(r1.message.value, "UTF-8") === "v2")
      assert(r1.message.key.isEmpty, "key dropped by the transport")
      assert(r1.message.tsMs >= t0, "server-stamped timestamp")

      // past-end is an EMPTY payload -> Right(None), not an Error frame
      assert(c.consumeOpt("t", 0L, 99L) === Right(None))

      // CommitOffset acks with empty bytes; the synthesized ack echoes
      // the request and the committed offset is really stored
      val Right(ack) = c.commitOffset("t", 0L, "g", 3L): @unchecked
      assert((ack.partition, ack.offset) === ((0L, 3L)))
      val Right(gr) = c.consumeWithGroup("t", 0L, "g"): @unchecked
      assert(gr.offset === 3L)
      // caught-up group is also an empty payload under quirks —
      // Right(None) through the Opt form, a named Left through the plain
      assert(c.commitOffset("t", 0L, "g", 5L).isRight)
      assert(c.consumeWithGroupOpt("t", 0L, "g") === Right(None))
      val caught = c.consumeWithGroup("t", 0L, "g")
      assert(caught.isLeft)
      assert(caught.swap.toOption.get.contains("caught up"))

      // the server-side files are STILL the shared layout (the quirk is
      // transport-level, not storage-level)
      val df = graft.sources.SegmentFiles.readTopic(spark, dir, "t")
      assert(df.count() === 5)
    } finally { c.close(); server.stop() }
  }

  test("quirkCompat source + producer: full Spark round-trip against the " +
      "quirk-faithful stub, and loud rejection of what the transport drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("flyq-quirk-spark").toString
    val server = new FlyqServer(dir, numPartitions = 1, quirks = true)
    val port = server.start()

    // a keyed frame cannot be quirk-produced: construction fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.streaming.SocketProduce.socketProduceWriter(
        MemoryStream[(Array[Byte], Array[Byte])](spark)
          .toDF().toDF("mkey", "mvalue"),
        "127.0.0.1", port, "t", quirkCompat = true)
    }
    assert(e.getMessage.contains("mkey"))
    // and the source refuses multi-partition quirk reads (thrown at
    // table resolution or at stream start, depending on the engine's
    // laziness — either way loudly, with the quirk named)
    val e2 = intercept[Exception] {
      spark.readStream.format("graft.sources.v2.FlyqSocketSource")
        .option("host", "127.0.0.1").option("port", port.toString)
        .option("topic", "t").option("partitions", "2")
        .option("quirkCompat", "true").load()
        .writeStream.format("memory").queryName("flyq_quirk_bad")
        .option("checkpointLocation",
          Files.createTempDirectory("flyq-quirk-bad-ckpt").toString)
        .start().processAllAvailable()
    }
    assert(e2.toString.contains("partition 0") ||
      String.valueOf(e2.getCause).contains("partition 0"))

    // value-only producer lands over the quirk wire
    val input = MemoryStream[Array[Byte]](spark)
    val w = graft.streaming.SocketProduce.socketProduceWriter(
        input.toDF().toDF("mvalue"), "127.0.0.1", port, "t",
        quirkCompat = true)
      .option("checkpointLocation",
        Files.createTempDirectory("flyq-quirk-prod-ckpt").toString)
      .start()
    try {
      input.addData((0 until 6).map(i => b(s"qv$i")): _*)
      w.processAllAvailable()
    } finally w.stop()

    // quirkCompat source streams them back: offsets labeled exactly as
    // asked (the echo discipline), all on partition 0
    val q = spark.readStream.format("graft.sources.v2.FlyqSocketSource")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("topic", "t").option("quirkCompat", "true").load()
      .writeStream.format("memory").queryName("flyq_quirk_rt")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("flyq-quirk-rt-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("flyq_quirk_rt")
        .select(col("part_id"), col("msg_offset"),
          col("mvalue").cast("string"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.map(_._3).toSet === (0 until 6).map(i => s"qv$i").toSet)
      assert(rows.map(_._1).toSet === Set(0L))
      assert(rows.map(_._2).sorted.toSeq === (0L until 6L))
      // live tail still works over the quirk wire
      val c = new FlyqClient("127.0.0.1", port, quirk = true)
      try assert(c.produce("t", WireMessage(0L, None, b("late"), Nil)).isRight)
      finally c.close()
      q.processAllAvailable()
      assert(spark.table("flyq_quirk_rt").count() === 7)
    } finally { q.stop(); server.stop() }
  }

  /** Minimal scripted wire stub for broker FAILURE modes a real
    * [[FlyqServer]] cannot be made to exhibit on demand: a Watermark
    * that advertises offsets the Consume path then cannot serve (torn
    * tail), and a Consume that HANGS instead of answering. */
  private class ScriptedBroker(quirkEnvelope: Boolean, low: Long,
                               high: Long, end: Long,
                               consumeBehavior: String) {
    import graft.protocol.Frame
    import graft.protocol.Frame.{Frame => WireFrame, FrameType}
    private val server = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private val accept = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          val w = new Thread(() => serve(sock))
          w.setDaemon(true); w.start()
        } catch { case _: Exception => () }
      }
    })
    accept.setDaemon(true); accept.start()
    private def serve(sock: java.net.Socket): Unit = {
      val in = new java.io.DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      try {
        while (true) {
          val header = new Array[Byte](Frame.HeaderLen)
          in.readFully(header)
          val len = java.nio.ByteBuffer.wrap(header, 6, 4).getInt
          val buf = new Array[Byte](Frame.HeaderLen + len)
          System.arraycopy(header, 0, buf, 0, Frame.HeaderLen)
          in.readFully(buf, Frame.HeaderLen, len)
          val Right(Some((frame, _))) = Frame.decode(buf): @unchecked
          val Right(req) = RequestPayload.decode(frame.payload): @unchecked
          val data: Option[Array[Byte]] = req.opCode match {
            case OpCode.Watermark => Some(WatermarkResponse.encode(
              WatermarkResponse(low, high, end)))
            case OpCode.Consume if consumeBehavior == "hang" =>
              Thread.sleep(600000L); None
            case _ => Some(Array.emptyByteArray) // quirk "nothing there"
          }
          data.foreach { d =>
            val payload = if (quirkEnvelope) req.opCode +: d else d
            out.write(Frame.encode(
              WireFrame(1, FrameType.Response, frame.correlationId, payload)))
            out.flush()
          }
        }
      } catch { case _: Exception => () } finally sock.close()
    }
    def stop(): Unit = server.close()
  }

  private def causeChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(20).toSeq

  test("quirk torn tail: a planned offset the broker cannot serve FAILS " +
      "the stream instead of silently skipping records") {
    // Watermark advertises [0,5) but every Consume answers "nothing
    // there" — the truncated-tail crash scenario. The checkpoint must
    // NOT advance past offsets that were never delivered.
    val stub = new ScriptedBroker(quirkEnvelope = true, 0L, 4L, 5L, "empty")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        spark.readStream.format("graft.sources.v2.FlyqSocketSource")
          .option("host", "127.0.0.1").option("port", stub.port.toString)
          .option("topic", "t").option("quirkCompat", "true").load()
          .writeStream.format("memory").queryName("flyq_torn")
          .option("checkpointLocation",
            Files.createTempDirectory("flyq-torn-ckpt").toString)
          .start().processAllAvailable()
      }
      assert(causeChain(e).exists(c =>
        String.valueOf(c.getMessage).contains("torn or truncated")),
        s"expected the torn-tail failure, got: $e")
    } finally stub.stop()
  }

  test("a broker that HANGS mid-batch fails the task via the read " +
      "timeout instead of wedging it (r15 advice #4)") {
    val stub = new ScriptedBroker(quirkEnvelope = false, 0L, 4L, 5L, "hang")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        spark.readStream.format("graft.sources.v2.FlyqSocketSource")
          .option("host", "127.0.0.1").option("port", stub.port.toString)
          .option("topic", "t").option("partitions", "1")
          .option("readTimeoutMs", "500").load()
          .writeStream.format("memory").queryName("flyq_hang")
          .option("checkpointLocation",
            Files.createTempDirectory("flyq-hang-ckpt").toString)
          .start().processAllAvailable()
      }
      assert(causeChain(e).exists(
        _.isInstanceOf[java.net.SocketTimeoutException]),
        s"expected SocketTimeoutException in the cause chain, got: $e")
    } finally stub.stop()
  }

  test("cross-dialect mismatches fail LOUDLY, not with silent misparses") {
    // a quirk client pointed at an ENGINE-semantics server: the bare
    // response body's first byte is not the opcode envelope — every
    // call comes back Left naming the envelope, nothing half-decodes
    val dir = Files.createTempDirectory("flyq-cross-a").toString
    val engine = new FlyqServer(dir, numPartitions = 1)
    val qc = new FlyqClient("127.0.0.1", engine.start(), quirk = true)
    try {
      // raw-value produce fails the engine's WireMessage decode — an
      // Error frame, surfaced as a Left (not a stored garbage record)
      val r = qc.produce("t", WireMessage(0L, None, b("v"), Nil))
      assert(r.isLeft)
      // watermark DOES get a Response frame — whose bare body fails the
      // quirk client's envelope check with the opcode named
      val w = qc.watermark("t", 0L)
      assert(w.isLeft)
      assert(w.swap.toOption.get.contains("opcode"),
        s"expected an envelope complaint, got $w")
    } finally { qc.close(); engine.stop() }

    // an engine client pointed at a QUIRK server: the enveloped
    // response fails the typed decode — Left, not a garbage ack
    val dir2 = Files.createTempDirectory("flyq-cross-b").toString
    val quirkSrv = new FlyqServer(dir2, numPartitions = 1, quirks = true)
    val ec = new FlyqClient("127.0.0.1", quirkSrv.start())
    try {
      // (the engine client's WireMessage-encoded produce bytes are
      // stored verbatim as a value by the quirk server — produce "works"
      // at the transport level; the detectable mismatch is on RESPONSES,
      // where the envelope byte would shift every fixed-width field —
      // the strict response decodes turn that into a named Left instead
      // of a byte-shifted garbage watermark)
      val w = ec.watermark("t", 0L)
      assert(w.isLeft, s"enveloped watermark must not half-decode: $w")
      assert(w.swap.toOption.get.contains("dialect mismatch"))
      val cr = ec.consume("t", 0L, 0L)
      assert(cr.isLeft, s"enveloped consume response must not decode: $cr")
    } finally { ec.close(); quirkSrv.stop() }
  }

  test("startingOffsets=latest attaches to a pre-loaded broker and " +
      "receives only post-start produces (r15 verdict #3)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-sock-latest").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      // the retained history a monitoring consumer must NOT replay
      (0 until 50).foreach { i =>
        assert(c.produce("t", WireMessage(1L + i, Some(b("k")),
          b(s"old$i"), Nil)).isRight)
      }
      val q = spark.readStream
        .format("graft.sources.v2.FlyqSocketSource")
        .option("host", "127.0.0.1").option("port", port.toString)
        .option("topic", "t").option("partitions", "1")
        .option("startingOffsets", "latest").load()
        .writeStream.format("memory").queryName("flyq_latest")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("flyq-latest-ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("flyq_latest").count() === 0,
          "latest must not replay the retained log")
        (0 until 3).foreach { i =>
          assert(c.produce("t", WireMessage(100L + i, Some(b("k")),
            b(s"new$i"), Nil)).isRight)
        }
        q.processAllAvailable()
        val got = spark.table("flyq_latest")
          .select(col("msg_offset"), col("mvalue").cast("string"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got === Map(50L -> "new0", 51L -> "new1", 52L -> "new2"))
      } finally q.stop()
    } finally { c.close(); server.stop() }
  }

  test("a protocol-level server error FAILS the stream instead of " +
      "holding forever (r15 advice #2); bogus startingOffsets rejected") {
    // invalid topic: the server ANSWERS (Error frame) on the very first
    // watermark RPC — that is a protocol error, not an outage, and the
    // query must die with FlyqProtocolException in its cause chain
    val dir = Files.createTempDirectory("flyq-sock-err").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val port = server.start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        spark.readStream.format("graft.sources.v2.FlyqSocketSource")
          .option("host", "127.0.0.1").option("port", port.toString)
          .option("topic", "bad/topic").option("partitions", "1").load()
          .writeStream.format("memory").queryName("flyq_protoerr")
          .option("checkpointLocation",
            Files.createTempDirectory("flyq-protoerr-ckpt").toString)
          .start().processAllAvailable()
      }
      var cause: Throwable = e
      var sawProto = false
      while (cause != null && !sawProto) {
        sawProto = cause.isInstanceOf[graft.protocol.FlyqProtocolException]
        cause = cause.getCause
      }
      assert(sawProto, s"expected FlyqProtocolException in: $e")

      val e2 = intercept[Exception] {
        spark.readStream.format("graft.sources.v2.FlyqSocketSource")
          .option("host", "127.0.0.1").option("port", port.toString)
          .option("topic", "t").option("startingOffsets", "bogus").load()
          .writeStream.format("memory").queryName("flyq_badopt")
          .option("checkpointLocation",
            Files.createTempDirectory("flyq-badopt-ckpt").toString)
          .start().processAllAvailable()
      }
      assert(e2.toString.contains("startingOffsets") ||
        String.valueOf(e2.getCause).contains("startingOffsets"))
    } finally server.stop()
  }

  test("socket stream survives a broker restart: driver reconnects, " +
      "offsets continue from the recovered write head") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-sock-restart").toString
    var server = new FlyqServer(dir, numPartitions = 1)
    val port = server.start()
    var c = new FlyqClient("127.0.0.1", port)
    val q = spark.readStream
      .format("graft.sources.v2.FlyqSocketSource")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("topic", "t").option("partitions", "1")
      .load()
      .writeStream.format("memory").queryName("flyq_restart")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("flyq-restart-ckpt").toString)
      .start()
    try {
      (0 until 3).foreach { i =>
        assert(c.produce("t", WireMessage(100L + i, Some(b("k")),
          b(s"pre$i"), Nil)).isRight)
      }
      q.processAllAvailable()
      assert(spark.table("flyq_restart").count() === 3)

      // broker bounce: the stream's cached driver connection and any
      // reader connections are now dead sockets
      c.close(); server.stop()
      server = new FlyqServer(dir, numPartitions = 1)
      // a real restarted broker retries its configured port: the old
      // incarnation's fds (deferred NIO close, FIN_WAIT conns from the
      // live stream) can hold the addr for a beat even with REUSEADDR
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      var bound = -1
      while (bound < 0) {
        try bound = server.start(port)
        catch {
          case _: java.net.BindException if System.nanoTime < deadline =>
            Thread.sleep(100)
        }
      }
      assert(bound === port)
      c = new FlyqClient("127.0.0.1", port)
      val Right(ack) = c.produce("t", WireMessage(200L, Some(b("k")),
        b("post"), Nil)): @unchecked
      assert(ack.offset === 3L, "write head recovers from disk")
      q.processAllAvailable()
      val got = spark.table("flyq_restart")
        .select(col("msg_offset"), col("mvalue").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size === 4)
      assert(got(3L) === "post",
        "post-restart produce must stream through the reconnected source")
    } finally { q.stop(); c.close(); server.stop() }
  }

  test("sequential consume rides the per-connection cursor across " +
      "segment rotations, interleaved random access, and live appends " +
      "(r16 verdict #1: answers identical to the stateless floor-seek)") {
    val dir = Files.createTempDirectory("flyq-sock-cursor").toString
    // ~40-byte records against a 256-byte segment cap: the 120-record
    // walk crosses dozens of rotation boundaries
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 5)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      (0 until 120).foreach { i =>
        assert(c.produce("t",
          WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      // sequential walk: after the first RPC every serve is a cursor hit
      (0L until 120L).foreach { off =>
        val Right(r) = c.consume("t", 0L, off): @unchecked
        assert(r.offset === off)
        assert(new String(r.message.value, "UTF-8") === s"v$off")
        // interleave a random access mid-walk: the cursor misses (next
        // != asked), the floor-seek answers, and the walk resumes
        if (off == 60L) {
          val Right(back) = c.consume("t", 0L, 7L): @unchecked
          assert(back.offset === 7L)
          val Right(fwd) = c.consume("t", 0L, 61L): @unchecked
          assert(fwd.offset === 61L)
        }
      }
      // caught up: the cursor answers out-of-range without re-seeking
      assert(c.consume("t", 0L, 120L).isLeft)
      // a live append past the caught-up cursor is served on the next ask
      assert(c.produce("t",
        WireMessage(9999L, Some(b("k")), b("tail"), Nil)).isRight)
      val Right(tail) = c.consume("t", 0L, 120L): @unchecked
      assert(tail.offset === 120L)
      assert(new String(tail.message.value, "UTF-8") === "tail")
      // a SECOND connection starts cold and reads the same answers (the
      // cursor is per-connection state, not shared server state)
      val c2 = new FlyqClient("127.0.0.1", port)
      try {
        val Right(r2) = c2.consume("t", 0L, 55L): @unchecked
        assert(new String(r2.message.value, "UTF-8") === "v55")
      } finally c2.close()
    } finally { c.close(); server.stop() }
  }

  test("live-tail under concurrent produce: a cursor walk racing a " +
      "producer across dozens of rotations serves every record exactly " +
      "once, in order, with caught-up polls in between") {
    val dir = Files.createTempDirectory("flyq-sock-race").toString
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 5)
    val port = server.start()
    val total = 500
    val producerErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable]
    val producer = new Thread(() => {
      val pc = new FlyqClient("127.0.0.1", port)
      try (0 until total).foreach { i =>
        pc.produce("t", WireMessage(i.toLong, Some(b("k")), b(s"v$i"), Nil))
          .fold(e => sys.error(e), _ => ())
        if (i % 50 == 0) Thread.sleep(1) // let the reader catch up and poll
      } catch { case t: Throwable => producerErr.set(t) }
      finally pc.close()
    }, "race-producer")
    producer.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      var off = 0L
      var served = 0
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (off < total && System.nanoTime < deadline) {
        c.consume("t", 0L, off) match {
          case Right(r) =>
            // single producer, dense offsets: any skip or repeat here is
            // a cursor bug (stale serve, double hop, missed rotation)
            assert(r.offset === off)
            assert(new String(r.message.value, "UTF-8") === s"v$off")
            served += 1
            off = r.offset + 1
          case Left(_) => () // caught up to the producer: poll again
        }
      }
      producer.join(30000)
      assert(producerErr.get() == null,
        s"producer failed: ${producerErr.get()}")
      assert(served === total)
    } finally { c.close(); server.stop() }
  }

  test("a cursor invalidated by retention re-seeks instead of serving " +
      "stale bytes: eviction under the walk lands at the first " +
      "surviving record (r16 verdict #1 hazard case)") {
    val dir = Files.createTempDirectory("flyq-sock-cursor-evict").toString
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 5)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      (0 until 60).foreach { i =>
        assert(c.produce("t",
          WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      val partDir = java.nio.file.Paths.get(dir, "topic_t", "partition_0")
      val bases = graft.sources.SegmentFiles.segmentBases(partDir)
      assert(bases.length >= 3, s"need multiple segments, got $bases")
      // walk INTO the oldest segment so the cursor points inside it
      (0L until 2L).foreach { off =>
        assert(c.consume("t", 0L, off).map(_.offset) === Right(off))
      }
      // retention evicts the two oldest segments out from under the
      // cursor (what a concurrent Maintenance pass does — the
      // BrokerMainSpec twin drives it through the real runner)
      bases.take(2).foreach { base =>
        Files.delete(partDir.resolve(f"segment_$base%020d.log"))
        Files.deleteIfExists(partDir.resolve(f"segment_$base%020d.index"))
      }
      val firstSurviving = bases(2)
      // the next sequential ask finds the cursor's segment gone, falls
      // back to the floor-seek, and serves the first surviving record —
      // exactly the stateless answer; never truncated/stale bytes
      val Right(r) = c.consume("t", 0L, 2L): @unchecked
      assert(r.offset === firstSurviving)
      assert(new String(r.message.value, "UTF-8") === s"v$firstSurviving")
      // and the walk continues sequentially from there on the re-seeded
      // cursor
      val Right(r2) = c.consume("t", 0L, r.offset + 1): @unchecked
      assert(r2.offset === firstSurviving + 1)
    } finally { c.close(); server.stop() }
  }

  test("a cursor over a DEFERRED-retired segment re-seeks: the manifest " +
      "drops the segment from the log while its file stays on disk for " +
      "leased readers, and the cursor must answer like the stateless " +
      "listing — never serve from a logically-dropped file (r17 review)") {
    val dir = Files.createTempDirectory("flyq-sock-retire").toString
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 5)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      (0 until 60).foreach { i =>
        assert(c.produce("t",
          WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      // walk INTO the oldest segment so the cursor points inside it
      (0L until 2L).foreach { off =>
        assert(c.consume("t", 0L, off).map(_.offset) === Right(off))
      }
      // deferred retention: the size cap RETIRES the older segments —
      // manifest written, files kept for pre-retirement reader leases
      val decisions = graft.operators.DeferredDelete.compactDeferred(
        spark, dir, "t", retentionMs = Long.MaxValue / 4,
        retentionBytes = 1024, retireAtMs = 1L)
      val retiredBases = decisions.filterNot(_.keep).map(_.baseOff)
      assert(retiredBases.contains(0L),
        "the cursor's segment must be among the retired for this test")
      val partDir = java.nio.file.Paths.get(dir, "topic_t", "partition_0")
      retiredBases.foreach { bse =>
        assert(Files.exists(partDir.resolve(f"segment_$bse%020d.log")),
          "deferred deletion keeps the file on disk — that is the trap")
      }
      val firstLive = decisions.filter(_.keep).map(_.baseOff).min
      // the next sequential ask sits exactly where the cursor points,
      // in a file that still exists — but the segment has left the log:
      // the serve must re-seek to the first LIVE record
      val Right(r) = c.consume("t", 0L, 2L): @unchecked
      assert(r.offset === firstLive)
      // ...which is precisely what a fresh connection answers
      val c2 = new FlyqClient("127.0.0.1", port)
      try assert(c2.consume("t", 0L, 2L).map(_.offset) === Right(firstLive))
      finally c2.close()
    } finally { c.close(); server.stop() }
  }

  test("retryTransient: a vanished-file race (concurrent retention) is " +
      "retried, a persistent failure propagates (r16 advice #1)") {
    val dir = Files.createTempDirectory("flyq-retry").toString
    val server = new FlyqServer(dir)
    var calls = 0
    val got = server.retryTransient({
      calls += 1
      if (calls < 3)
        throw new java.nio.file.NoSuchFileException("segment gone mid-list")
      "served"
    })
    assert(got === "served")
    assert(calls === 3)
    // bounded: a NoSuchFileException that survives every attempt is a
    // real filesystem problem, not a race — it must propagate
    calls = 0
    intercept[java.nio.file.NoSuchFileException] {
      server.retryTransient({
        calls += 1
        throw new java.nio.file.NoSuchFileException("really gone")
      })
    }
    assert(calls === 3)
    server.stop()
  }

  test("quirkCompat holds are BOUNDED (r16 advice #3): after " +
      "maxHoldTriggers consecutive transport failures the stream fails " +
      "loudly naming both possible causes, instead of holding forever " +
      "on a topic that may no longer exist") {
    val dir = Files.createTempDirectory("flyq-hold-bound").toString
    val server = new FlyqServer(dir, numPartitions = 1, quirks = true)
    val port = server.start()
    val qc = new FlyqClient("127.0.0.1", port, quirk = true)
    try {
      (0 until 3).foreach { i =>
        assert(qc.produce("t", WireMessage(0L, None, b(s"v$i"), Nil)).isRight)
      }
    } finally qc.close()
    val q = spark.readStream
      .format("graft.sources.v2.FlyqSocketSource")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("topic", "t").option("quirkCompat", "true")
      .option("maxHoldTriggers", "3")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("flyq-hold-ckpt").toString)
      .start()
    try {
      q.processAllAvailable() // at least one good latestOffset first
      server.stop() // the wire cannot say whether it is coming back
      val e = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(120000): Unit
        fail("stream held past maxHoldTriggers instead of failing")
      }
      val chain = causeChain(e)
      assert(chain.exists(
        _.isInstanceOf[graft.protocol.FlyqProtocolException]))
      assert(chain.exists(t =>
        String.valueOf(t.getMessage).contains("maxHoldTriggers")))
    } finally { q.stop(); server.stop() }
  }

  test("quirk ConsumeWithGroup labels the FETCHED group offset, not the " +
      "served record's (listener.rs:166-169 via log_engine.rs:152-160 — " +
      "r16 advice #2): after a retention trim the reference mislabels, " +
      "and the stub must too; the engine dialect keeps real offsets") {
    val dir = Files.createTempDirectory("flyq-quirk-group").toString
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 5, quirks = true)
    val qc = new FlyqClient("127.0.0.1", server.start(), quirk = true)
    try {
      (0 until 40).foreach { i =>
        assert(qc.produce("t", WireMessage(0L, None, b(s"v$i"), Nil)).isRight)
      }
      val partDir = java.nio.file.Paths.get(dir, "topic_t", "partition_0")
      val bases = graft.sources.SegmentFiles.segmentBases(partDir)
      assert(bases.length >= 2)
      // trim the oldest segment; the group has committed nothing, so the
      // fetched offset is 0 while the first surviving record is at
      // bases(1)
      Files.delete(partDir.resolve(f"segment_${bases.head}%020d.log"))
      Files.deleteIfExists(partDir.resolve(f"segment_${bases.head}%020d.index"))
      val Right(Some(r)) = qc.consumeWithGroupOpt("t", 0L, "g"): @unchecked
      assert(r.offset === 0L,
        "the reference passes the OffsetTracker value through, not the " +
          "record's real offset")
      assert(new String(r.message.value, "UTF-8") === s"v${bases(1)}",
        "…while the BYTES are the first surviving record's")
    } finally { qc.close(); server.stop() }

    // engine dialect contrast on the same on-disk situation: the real
    // offset is labeled
    val dir2 = Files.createTempDirectory("flyq-engine-group").toString
    val server2 = new FlyqServer(dir2, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 5)
    val c2 = new FlyqClient("127.0.0.1", server2.start())
    try {
      (0 until 40).foreach { i =>
        assert(c2.produce("t",
          WireMessage(0L, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      val partDir2 = java.nio.file.Paths.get(dir2, "topic_t", "partition_0")
      val bases2 = graft.sources.SegmentFiles.segmentBases(partDir2)
      Files.delete(partDir2.resolve(f"segment_${bases2.head}%020d.log"))
      Files.deleteIfExists(
        partDir2.resolve(f"segment_${bases2.head}%020d.index"))
      val Right(r2) = c2.consumeWithGroup("t", 0L, "g"): @unchecked
      assert(r2.offset === bases2(1))
      assert(new String(r2.message.value, "UTF-8") === s"v${bases2(1)}")
    } finally { c2.close(); server2.stop() }
  }

  test("a failed log write evicts the head: recovery truncates the torn " +
      "fragment so later acked records stay reachable (r17 protocol review #1)") {
    val dir = Files.createTempDirectory("flyq-wfail").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      (0 until 3).foreach { i =>
        assert(c.produce("t",
          WireMessage(10L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      // simulate the PARTIAL bytes an ENOSPC-interrupted write leaves
      // behind (the head never accounted them), then make the next
      // write fail through the real IOException path
      val seg = java.nio.file.Paths.get(dir, "topic_t", "partition_0",
        "segment_00000000000000000000.log")
      Files.write(seg, Array[Byte](0, 0, 0, 99, 1, 2, 3),
        java.nio.file.StandardOpenOption.APPEND)
      server.failNextWriteForTest("t", 0L)
      assert(c.produce("t",
        WireMessage(13L, Some(b("k")), b("lost"), Nil)).isLeft)
      // recovery: the retry re-seeds from disk, truncates the fragment,
      // and resumes at the correct dense offset — the OLD append-mode
      // reopen would have stranded this record behind the torn bytes
      val Right(ack) = c.produce("t",
        WireMessage(14L, Some(b("k")), b("v3"), Nil)): @unchecked
      assert(ack.offset === 3L)
      (0 until 4).foreach { i =>
        val Right(r) = c.consume("t", 0L, i.toLong): @unchecked
        assert(r.offset === i.toLong)
        assert(new String(r.message.value, "UTF-8") === s"v$i")
      }
      val Right(wm) = c.watermark("t", 0L): @unchecked
      assert(wm.logEndOffset === 4L)
    } finally { c.close(); server.stop() }
  }

  test("a failed INDEX write after a successful log write cannot assign " +
      "an offset twice (r17 protocol review #1)") {
    val dir = Files.createTempDirectory("flyq-idxfail").toString
    val server = new FlyqServer(dir, numPartitions = 1, indexInterval = 1)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      (0 until 2).foreach { i =>
        assert(c.produce("t",
          WireMessage(1L, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      server.failNextWriteForTest("t", 0L, log = false, idx = true)
      // the log write lands (an unacked ORPHAN at offset 2), the index
      // write fails -> error to the producer, head evicted
      assert(c.produce("t",
        WireMessage(1L, Some(b("k")), b("orphan"), Nil)).isLeft)
      // the retry must NOT reuse offset 2: re-seeding counts the orphan
      val Right(ack) = c.produce("t",
        WireMessage(1L, Some(b("k")), b("retry"), Nil)): @unchecked
      assert(ack.offset === 3L,
        "re-seeding must account the on-disk orphan record")
      val Right(o) = c.consume("t", 0L, 2L): @unchecked
      assert(new String(o.message.value, "UTF-8") === "orphan")
      val Right(r) = c.consume("t", 0L, 3L): @unchecked
      assert(new String(r.message.value, "UTF-8") === "retry")
      val Right(wm) = c.watermark("t", 0L): @unchecked
      assert(wm.logEndOffset === 4L)
    } finally { c.close(); server.stop() }
  }

  test("a torn index tail is repaired at restart: later entries never " +
      "land 8-byte shifted behind a partial entry (r17 protocol review #3)") {
    val dir = Files.createTempDirectory("flyq-idxtorn").toString
    val server1 = new FlyqServer(dir, numPartitions = 1, indexInterval = 1)
    val c1 = new FlyqClient("127.0.0.1", server1.start())
    try {
      (0 until 5).foreach { i =>
        assert(c1.produce("t",
          WireMessage(1L, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
    } finally { c1.close(); server1.stop() }
    val pdir = java.nio.file.Paths.get(dir, "topic_t", "partition_0")
    val log = pdir.resolve("segment_00000000000000000000.log")
    val idx = pdir.resolve("segment_00000000000000000000.index")
    val tornPos = Files.size(log)
    // crash leftovers: a torn record on the log, a complete-looking
    // index entry pointing INTO the torn region, and half an entry
    Files.write(log, Array[Byte](0, 0, 0, 99, 9, 9),
      java.nio.file.StandardOpenOption.APPEND)
    val ghost = java.nio.ByteBuffer.allocate(16)
    ghost.putLong(5L); ghost.putLong(tornPos)
    Files.write(idx, ghost.array() ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
      java.nio.file.StandardOpenOption.APPEND)

    val server2 = new FlyqServer(dir, numPartitions = 1, indexInterval = 1)
    val c2 = new FlyqClient("127.0.0.1", server2.start())
    try {
      val Right(ack) = c2.produce("t",
        WireMessage(1L, Some(b("k")), b("v5"), Nil)): @unchecked
      assert(ack.offset === 5L)
      assert(Files.size(idx) % 16 === 0L, "repair must leave whole entries")
      (0 to 5).foreach { i =>
        val Right(r) = c2.consume("t", 0L, i.toLong): @unchecked
        assert(r.offset === i.toLong)
        assert(new String(r.message.value, "UTF-8") === s"v$i")
      }
    } finally { c2.close(); server2.stop() }
  }

  test("pre-dispatch failures echo the header's correlation id instead " +
      "of answering corr 0 (r17 protocol review #5)") {
    import graft.protocol.Frame
    import graft.protocol.Frame.{Frame => WireFrame, FrameType}
    val dir = Files.createTempDirectory("flyq-corr").toString
    val server = new FlyqServer(dir, numPartitions = 1)
    val port = server.start()
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val out = sock.getOutputStream
      val in = new java.io.DataInputStream(sock.getInputStream)
      val good = Frame.encode(WireFrame(1, FrameType.Request, 42,
        RequestPayload.encode(RequestPayload(OpCode.Watermark,
          WatermarkRequest.encode(WatermarkRequest("t", 0L))))))
      good(10) = (good(10) ^ 0x7f).toByte // corrupt the checksum field
      out.write(good); out.flush()
      val header = new Array[Byte](Frame.HeaderLen)
      in.readFully(header)
      val len = java.nio.ByteBuffer.wrap(header, 6, 4).getInt
      val buf = new Array[Byte](Frame.HeaderLen + len)
      System.arraycopy(header, 0, buf, 0, Frame.HeaderLen)
      in.readFully(buf, Frame.HeaderLen, len)
      val Right(Some((f, _))) = Frame.decode(buf): @unchecked
      assert(f.frameType === FrameType.Error)
      assert(f.correlationId === 42)
      assert(new String(f.payload, "UTF-8").contains("checksum mismatch"))
    } finally { sock.close(); server.stop() }
  }

  test("an Error frame's diagnostic survives a correlation mismatch on " +
      "the client (r17 protocol review #5)") {
    import graft.protocol.Frame
    import graft.protocol.Frame.{Frame => WireFrame, FrameType}
    // a broker (or an older incarnation of ours) that answers a
    // pre-dispatch failure with corr 0: the MESSAGE is the diagnostic
    val ss = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = ss.accept()
      val in = new java.io.DataInputStream(s.getInputStream)
      val header = new Array[Byte](Frame.HeaderLen)
      in.readFully(header)
      val len = java.nio.ByteBuffer.wrap(header, 6, 4).getInt
      in.readFully(new Array[Byte](len))
      s.getOutputStream.write(Frame.encode(
        WireFrame(1, FrameType.Error, 0, b("checksum mismatch: deadbeef"))))
      s.getOutputStream.flush()
    })
    t.setDaemon(true); t.start()
    val c = new FlyqClient("127.0.0.1", ss.getLocalPort)
    try {
      val Left(err) = c.watermark("t", 0L): @unchecked
      assert(err.contains("checksum mismatch"),
        s"the server's diagnostic must surface, got: $err")
      assert(!err.contains("correlation mismatch"))
    } finally { c.close(); ss.close() }
  }

  test("engine reader: planned offsets evicted mid-batch FAIL the task " +
      "by default and skip loudly under failOnDataLoss=false " +
      "(r17 protocol review #2)") {
    import graft.sources.v2.{FlyqSocketInputPartition, FlyqSocketPartitionReader}
    val dir = Files.createTempDirectory("flyq-loss").toString
    val server = new FlyqServer(dir, numPartitions = 1,
      segMaxBytes = 256, indexInterval = 4)
    val port = server.start()
    val c = new FlyqClient("127.0.0.1", port)
    try {
      (0 until 40).foreach { i =>
        assert(c.produce("t",
          WireMessage(1L, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      val pdir = java.nio.file.Paths.get(dir, "topic_t", "partition_0")
      val bases = graft.sources.SegmentFiles.segmentBases(pdir)
      assert(bases.length >= 3)
      // retention evicts the oldest segment between planning and read
      Files.delete(pdir.resolve(f"segment_${bases.head}%020d.log"))
      Files.deleteIfExists(pdir.resolve(f"segment_${bases.head}%020d.index"))
      def split(fail: Boolean) = FlyqSocketInputPartition("127.0.0.1", port,
        "t", 0L, 0L, 40L, quirk = false, readTimeoutMs = 5000,
        failOnDataLoss = fail)
      // default: loud failure naming the lost range — the checkpoint
      // must never silently advance past undelivered records
      val strict = new FlyqSocketPartitionReader(split(fail = true))
      val e = try intercept[IllegalStateException](strict.next())
              finally strict.close()
      assert(e.getMessage.contains(s"[0, ${bases(1)})"))
      // opt-out: serve the survivors, labeled with their REAL offsets
      val lax = new FlyqSocketPartitionReader(split(fail = false))
      try {
        val got = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (lax.next()) got += lax.get().getLong(1)
        assert(got.toSeq === (bases(1) until 40L))
      } finally lax.close()
      // total eviction: nothing in the planned range survives — strict
      // fails (protocol error), lax ends the split empty but warned
      bases.tail.foreach { bs =>
        Files.delete(pdir.resolve(f"segment_$bs%020d.log"))
        Files.deleteIfExists(pdir.resolve(f"segment_$bs%020d.index"))
      }
      val strict2 = new FlyqSocketPartitionReader(split(fail = true))
      try intercept[graft.protocol.FlyqProtocolException](strict2.next()): Unit
      finally strict2.close()
      val lax2 = new FlyqSocketPartitionReader(split(fail = false))
      try assert(!lax2.next()) finally lax2.close()
    } finally { c.close(); server.stop() }
  }
}
