package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.{FlyqBrokerMain, FlyqClient}
import graft.protocol.Payloads.WireMessage

/** The standalone broker binary (`main.rs` composition parity): CLI
  * parsing, the serve+maintain composition, and the flush-before-exit
  * shutdown order. */
class BrokerMainSpec extends AnyFunSuite {

  lazy val spark = Testing.spark // getOrCreate inside start() reuses this

  private def b(s: String) = s.getBytes("UTF-8")

  test("parseArgs: defaults, both flag forms, and loud unknown flags") {
    val d = FlyqBrokerMain.parseArgs(Array.empty)
    assert(d.baseDir === sys.env.getOrElse("FLYQ_BASE_DIR", "./data"))
    assert(d.port === sys.env.get("FLYQ_PORT").map(_.toInt).getOrElse(9092))
    assert(d.maintenance)
    assert(!d.quirks)

    val c = FlyqBrokerMain.parseArgs(Array(
      "--base-dir=/tmp/x", "--port", "7777", "--partitions=2",
      "--cleanup-interval-ms", "50", "--quirks", "--no-maintenance"))
    assert(c === FlyqBrokerMain.Config("/tmp/x", 7777, 2, 50L,
      quirks = true, maintenance = false))

    val e = intercept[IllegalArgumentException] {
      FlyqBrokerMain.parseArgs(Array("--bogus"))
    }
    assert(e.getMessage.contains("--bogus"))
    val e2 = intercept[IllegalArgumentException] {
      FlyqBrokerMain.parseArgs(Array("--port"))
    }
    assert(e2.getMessage.contains("--port"))
  }

  test("parseArgs: boolean flags honor an inline value — `--quirks=false` " +
      "must not enable quirks (r17 protocol review #4)") {
    assert(!FlyqBrokerMain.parseArgs(Array("--quirks=false")).quirks)
    assert(FlyqBrokerMain.parseArgs(Array("--quirks=true")).quirks)
    assert(FlyqBrokerMain.parseArgs(Array("--quirks")).quirks)
    assert(FlyqBrokerMain.parseArgs(
      Array("--no-maintenance=false")).maintenance)
    assert(!FlyqBrokerMain.parseArgs(
      Array("--no-maintenance=true")).maintenance)
    // garbage is rejected loudly, never silently coerced
    val e = intercept[IllegalArgumentException] {
      FlyqBrokerMain.parseArgs(Array("--quirks=yes"))
    }
    assert(e.getMessage.contains("--quirks"))
    assert(e.getMessage.contains("yes"))
  }

  test("start(): serves TCP, runs maintenance passes, and the shutdown " +
      "order flushes before exit (final pass, then meta snapshot)") {
    val dir = Files.createTempDirectory("flyq-broker-main").toString
    val broker = FlyqBrokerMain.start(FlyqBrokerMain.Config(
      dir, port = 0, partitions = 1, cleanupIntervalMs = 60000L,
      quirks = false, maintenance = true))
    try {
      val c = new FlyqClient("127.0.0.1", broker.port)
      try {
        (0 until 3).foreach { i =>
          assert(c.produce("t",
            WireMessage(1L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
        }
        val Right(wm) = c.watermark("t", 0L): @unchecked
        assert(wm.logEndOffset === 3L)
      } finally c.close()
      // manual tick = the ops "run it now" path; the pass must discover
      // the topic the socket produced
      val r = broker.runner.get
      val before = r.passCount
      r.tick()
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (r.passCount <= before && System.nanoTime < deadline)
        Thread.sleep(20)
      assert(r.passCount > before, "maintenance pass did not run on tick")
      assert(r.lastPass.errors.isEmpty, r.lastPass.errors.toString)
      assert(r.lastPass.decisions.contains("t"))
    } finally broker.close()
    // flush-before-exit: close() ran the runner's final pass and then
    // FlyqServer.stop()'s meta.json watermark snapshot
    val meta = Paths.get(dir, "topic_t", "partition_0", "meta.json")
    assert(Files.exists(meta))
    val text = new String(Files.readAllBytes(meta), "UTF-8")
    assert(text.contains("\"log_end_offset\":3"))
  }

  test("parseArgs: the reference config.rs knobs (segment_max_bytes, " +
      "retention, retention_bytes) ride as flags") {
    val c = FlyqBrokerMain.parseArgs(Array(
      "--segment-bytes=256", "--retention-ms", "86400000",
      "--retention-bytes=1024"))
    assert(c.segmentBytes === 256L)
    assert(c.retentionMs === 86400000L)
    assert(c.retentionBytes === 1024L)
    // defaults are the reference's PRODUCTION defaults (config.rs:28-31),
    // not the library's test-scale LogModel constants — a binary
    // defaulting to 4 KiB segments + a 16 KiB size cap would silently
    // evict a default-configured broker's data on the first pass
    val d = FlyqBrokerMain.parseArgs(Array.empty)
    assert(d.segmentBytes === 1024L * 1024 * 1024)
    assert(d.retentionMs === 7L * 24 * 60 * 60 * 1000)
    assert(d.retentionBytes === Long.MaxValue) // size retention OFF
  }

  test("retention firing under an active socket-source reader (r16 " +
      "verdict #7): eviction below the stream's checkpointed position " +
      "FAILS loudly by default (failOnDataLoss, Kafka parity) and, under " +
      "the documented opt-out, resumes at the new low watermark — every " +
      "surviving record exactly once, never stale bytes, never a SILENT " +
      "skip") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("flyq-broker-evict").toString
    // tiny segments + a size cap through the binary's own flags (the
    // reference's segment_max_bytes / retention_bytes, config.rs:13-19);
    // a huge cleanup interval so eviction happens exactly when ticked
    val broker = FlyqBrokerMain.start(FlyqBrokerMain.Config(
      dir, port = 0, partitions = 1, cleanupIntervalMs = 3600000L,
      quirks = false, maintenance = true,
      segmentBytes = 256, retentionMs = Long.MaxValue / 4,
      retentionBytes = 1024))
    val ckpt = Files.createTempDirectory("flyq-broker-evict-ckpt").toString
    val out = Files.createTempDirectory("flyq-broker-evict-out").toString
    val c = new FlyqClient("127.0.0.1", broker.port)
    try {
      (0 until 30).foreach { i =>
        assert(c.produce("t",
          WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      // a file sink, because it supports exactly-once checkpoint
      // RECOVERY — the memory sink cannot resume, and resuming across
      // the eviction is the whole point of this test
      def stream(extraOpts: (String, String)*) = {
        val reader = spark.readStream
          .format("graft.sources.v2.FlyqSocketSource")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "t").option("partitions", "1")
          .option("startingOffsets", "earliest")
        extraOpts.foreach { case (k, v) => reader.option(k, v) }
        reader.load()
          .select(col("msg_offset"), col("mvalue").cast("string").as("v"))
          .writeStream.format("parquet").option("path", out)
          .outputMode("append").option("checkpointLocation", ckpt).start()
      }
      // phase 1: replay from earliest, checkpoint lands at offset 30
      val q1 = stream()
      try {
        q1.processAllAvailable()
        assert(spark.read.parquet(out).count() === 30)
      } finally q1.stop()

      // the log grows past the reader's checkpoint, then the broker's
      // OWN maintenance runner evicts segments BELOW that checkpoint
      (30 until 60).foreach { i =>
        assert(c.produce("t",
          WireMessage(1000L + i, Some(b("k")), b(s"v$i"), Nil)).isRight)
      }
      val r = broker.runner.get
      val before = r.passCount
      r.tick()
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (r.passCount <= before && System.nanoTime < deadline)
        Thread.sleep(20)
      assert(r.passCount > before, "maintenance pass did not run on tick")
      assert(r.lastPass.errors.isEmpty, r.lastPass.errors.toString)
      assert(r.lastPass.decisions("t").exists(!_.keep),
        "the size cap must actually evict segments")
      val survivingBases = graft.sources.SegmentFiles.segmentBases(
        Paths.get(dir, "topic_t", "partition_0"))
      val firstSurviving = survivingBases.min
      assert(firstSurviving > 30L,
        s"eviction must bite BELOW the checkpointed offset 30 for this " +
          s"test to exercise the hazard (low watermark $firstSurviving)")
      val Right(wm) = c.watermark("t", 0L): @unchecked
      assert(wm.lowWatermark === firstSurviving)

      // phase 2a: the stream resumes from its checkpoint (offset 30, now
      // under the low watermark) with the DEFAULT failOnDataLoss=true —
      // the evicted range [30, lowWatermark) is data the checkpoint
      // promised and the broker can no longer serve, so the query FAILS
      // loudly naming the option (r17 protocol review #2; Kafka's
      // default does the same for aged-out offsets)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        val q = stream()
        try q.processAllAvailable() finally q.stop()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(20).toSeq
      assert(chain.exists(c => String.valueOf(c.getMessage)
          .contains("failOnDataLoss")),
        s"expected the data-loss failure naming the opt-out, got: $e")
      // the failed batch must not have leaked rows past the checkpoint
      assert(spark.read.parquet(out).count() === 30)

      // phase 2b: the documented opt-out resumes at the new low
      // watermark — every surviving record exactly once, never stale
      // bytes, never duplicates
      val q2 = stream("failOnDataLoss" -> "false")
      try {
        q2.processAllAvailable()
        val got = spark.read.parquet(out)
          .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
        assert(got.map(_._1).toSeq ===
          ((0L until 30L) ++ (firstSurviving until 60L)),
          "phase-1 rows plus exactly the surviving offsets, each exactly " +
            "once — no duplicates, no skips of data still on disk")
        got.foreach { case (off, v) => assert(v === s"v$off") }
      } finally q2.stop()
    } finally { c.close(); broker.close() }
  }

  test("start() with --no-maintenance serves without a runner; --quirks " +
      "serves the reference dialect") {
    val dir = Files.createTempDirectory("flyq-broker-quirk").toString
    val broker = FlyqBrokerMain.start(FlyqBrokerMain.Config(
      dir, port = 0, partitions = 1, cleanupIntervalMs = 60000L,
      quirks = true, maintenance = false))
    try {
      assert(broker.runner.isEmpty)
      val qc = new FlyqClient("127.0.0.1", broker.port, quirk = true)
      try {
        val Right(ack) = qc.produce("t",
          WireMessage(0L, None, b("raw"), Nil)): @unchecked
        assert(ack.offset === 0L)
        val Right(Some(r)) = qc.consumeOpt("t", 0L, 0L): @unchecked
        assert(new String(r.message.value, "UTF-8") === "raw")
      } finally qc.close()
    } finally broker.close()
  }
}
