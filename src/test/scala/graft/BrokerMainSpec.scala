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
