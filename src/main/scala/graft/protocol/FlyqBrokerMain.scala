package graft.protocol

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession

import graft.operators.Maintenance

/** The standalone BROKER BINARY — the reference ships one
  * (`flyq-server/src/main.rs`: parse params, load the engine, start the
  * background runtime, serve TCP until ctrl-c, flush before exit), and a
  * user switching from it should get the same `run a broker process`
  * experience here:
  *
  * {{{
  *   sbt "runMain graft.protocol.FlyqBrokerMain --base-dir ./data --port 9092"
  * }}}
  *
  * Flags mirror the reference's `Params` (`server/params.rs`) plus the
  * knobs its `--config` file carries (`server/config.rs:13-31`):
  * `--base-dir` (env `FLYQ_BASE_DIR`, default `./data`), `--port` (env
  * `FLYQ_PORT`, default 9092), `--partitions` (default
  * [[graft.model.LogModel.NumPartitions]]), `--cleanup-interval-ms`
  * (default [[Maintenance.DefaultIntervalMs]], the reference's
  * `cleanup_interval`), `--segment-bytes` (the reference's
  * `segment_max_bytes`), `--retention-ms` / `--retention-bytes` (the
  * reference's `retention` / `retention_bytes`), `--quirks` (serve the
  * reference's transport dialect instead of engine semantics), and
  * `--no-maintenance` (serve only — no Spark session, no background
  * loops). Sizing DEFAULTS are the reference's PRODUCTION defaults
  * (`config.rs:28-31`): 1 GiB segments, 7-day time retention,
  * size-based retention OFF (its `retention_bytes: None`) — NOT the
  * library's test-scale `LogModel` constants (4 KiB / 16 KiB), which
  * exist for the oracle queries' fixtures; a binary defaulting to
  * those would rotate every ~100 records and silently evict all but
  * the newest ~16 KiB per partition on the first maintenance pass
  * (r17 review #3).
  *
  * Composition parity with `main.rs`:
  *  - `server::start`            → [[FlyqServer.start]];
  *  - `runtime::run`'s periodic cleanup (`runtime/flush.rs`)
  *                               → [[Maintenance.Runner]] (retention per
  *    pass; discovery failures warn and keep ticking, like the
  *    reference's cleanup task);
  *  - `runtime::run`'s offset flush → not needed: [[FlyqServer]]
  *    persists `consumer_offsets.json` synchronously per commit (a
  *    documented durability upgrade over the 5 s flush loop);
  *  - `runtime::run`'s metadata flush + ctrl-c "flush before exit"
  *                               → the shutdown hook's final
  *    [[Maintenance.Runner.close]] pass and [[FlyqServer.stop]]'s
  *    meta.json watermark snapshot.
  *
  * The maintenance loops run on a Spark session (`local[2]` unless one
  * already exists in the JVM) because retention/compaction ARE Spark
  * jobs here — the same executable plans the library exposes, not a
  * reimplementation.
  */
object FlyqBrokerMain {

  /** Reference production defaults (`flyq-server/src/config.rs:28-31`). */
  val DefaultSegmentBytes: Long = 1024L * 1024 * 1024 // 1 GiB
  val DefaultRetentionMs: Long = 7L * 24 * 60 * 60 * 1000 // 7 days
  /** `retention_bytes: None` — size-based retention disabled. */
  val DefaultRetentionBytes: Long = Long.MaxValue

  final case class Config(baseDir: String, port: Int, partitions: Int,
                          cleanupIntervalMs: Long, quirks: Boolean,
                          maintenance: Boolean,
                          segmentBytes: Long = DefaultSegmentBytes,
                          retentionMs: Long = DefaultRetentionMs,
                          retentionBytes: Long = DefaultRetentionBytes)

  /** `--key value` / `--key=value` / bare flags; unknown keys fail
    * loudly naming the flag (the reference's clap does the same). */
  private[graft] def parseArgs(args: Array[String]): Config = {
    var baseDir = sys.env.getOrElse("FLYQ_BASE_DIR", "./data")
    var port = sys.env.get("FLYQ_PORT").map(_.toInt).getOrElse(9092)
    var partitions = graft.model.LogModel.NumPartitions.toInt
    var interval = Maintenance.DefaultIntervalMs
    var segmentBytes = DefaultSegmentBytes
    var retentionMs = DefaultRetentionMs
    var retentionBytes = DefaultRetentionBytes
    var quirks = false
    var maintenance = true
    var i = 0
    def value(key: String, inline: Option[String]): String = inline match {
      case Some(v) => v
      case None =>
        i += 1
        if (i >= args.length)
          throw new IllegalArgumentException(s"$key requires a value")
        args(i)
    }
    // boolean flags: bare = true, but an INLINE value must be honored
    // or rejected — silently discarding it made `--quirks=false` serve
    // the quirk dialect, the exact opposite of what the operator wrote
    // (r17 protocol review #4)
    def boolValue(key: String, inline: Option[String]): Boolean =
      inline match {
        case None => true
        case Some(v) => v.toLowerCase match {
          case "true" => true
          case "false" => false
          case other => throw new IllegalArgumentException(
            s"$key expects true or false, got '$other'")
        }
      }
    while (i < args.length) {
      val (key, inline) = args(i).split("=", 2) match {
        case Array(k, v) => (k, Some(v))
        case Array(k) => (k, None)
      }
      key match {
        case "--base-dir" => baseDir = value(key, inline)
        case "--port" => port = value(key, inline).toInt
        case "--partitions" => partitions = value(key, inline).toInt
        case "--cleanup-interval-ms" => interval = value(key, inline).toLong
        case "--segment-bytes" => segmentBytes = value(key, inline).toLong
        case "--retention-ms" => retentionMs = value(key, inline).toLong
        case "--retention-bytes" => retentionBytes = value(key, inline).toLong
        case "--quirks" => quirks = boolValue(key, inline)
        case "--no-maintenance" => maintenance = !boolValue(key, inline)
        case other => throw new IllegalArgumentException(
          s"unknown flag '$other' (expected --base-dir, --port, " +
            "--partitions, --cleanup-interval-ms, --segment-bytes, " +
            "--retention-ms, --retention-bytes, --quirks, " +
            "--no-maintenance)")
      }
      i += 1
    }
    Config(baseDir, port, partitions, interval, quirks, maintenance,
      segmentBytes, retentionMs, retentionBytes)
  }

  /** A started broker: the TCP server plus (unless `--no-maintenance`)
    * the background retention runner. [[close]] runs the final
    * maintenance pass, then stops the server (which snapshots
    * meta.json) — the reference's flush-before-exit order. The Spark
    * session is NOT stopped here: it may be shared with an embedding
    * application (or a test suite); [[main]] owns process exit. */
  final class RunningBroker(val server: FlyqServer, val port: Int,
                            val runner: Option[Maintenance.Runner])
      extends AutoCloseable {
    override def close(): Unit = close(0L)

    /** Bounded variant for the SIGTERM shutdown hook: a maintenance
      * pass wedged in a stuck FS call must not make the broker
      * unkillable (JVM exit blocks on the hook), and the meta.json
      * snapshot in [[FlyqServer.stop]] must still run. */
    def close(runnerJoinTimeoutMs: Long): Unit = {
      runner.foreach { r =>
        if (!r.close(runnerJoinTimeoutMs))
          System.err.println("[flyq-broker] WARNING: maintenance pass " +
            s"still running after ${runnerJoinTimeoutMs} ms — abandoning " +
            "it to complete shutdown")
      }
      server.stop()
    }
  }

  def start(cfg: Config): RunningBroker = {
    val server = new FlyqServer(cfg.baseDir, cfg.partitions,
      segMaxBytes = cfg.segmentBytes, quirks = cfg.quirks)
    val port = server.start(cfg.port)
    val runner =
      if (!cfg.maintenance) None
      else {
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("FLYQ_SPARK_MASTER", "local[2]"))
          .appName("flyq-broker-maintenance")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        Some(new Maintenance.Runner(spark, cfg.baseDir,
          intervalMs = cfg.cleanupIntervalMs,
          retentionMs = cfg.retentionMs,
          retentionBytes = cfg.retentionBytes).start())
      }
    new RunningBroker(server, port, runner)
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    val broker = start(cfg)
    System.err.println(s"[flyq-broker] serving ${cfg.baseDir} on port " +
      s"${broker.port} (partitions=${cfg.partitions}, " +
      s"quirks=${cfg.quirks}, maintenance=${cfg.maintenance})")
    val done = new CountDownLatch(1)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      System.err.println("[flyq-broker] shutting down: final maintenance " +
        "pass + meta snapshot")
      broker.close(runnerJoinTimeoutMs = 30000L)
      done.countDown()
    }, "flyq-broker-shutdown"))
    done.await() // serve until SIGINT/SIGTERM — the reference's ctrl_c
  }
}
