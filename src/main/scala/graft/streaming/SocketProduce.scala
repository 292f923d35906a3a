package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.protocol.FlyqClient
import graft.protocol.Payloads.WireMessage

/** Streaming PRODUCER into a live FlyQ broker over TCP — the write half
  * of the wire boundary ([[graft.sources.v2.FlyqSocketSource]] is the
  * read half): Spark is the reference's CLIENT here
  * (`listener.rs:86-96` produce dispatch), so partition routing
  * (xxh3-u32-mod for keyed, round-robin for keyless) and offset
  * assignment happen SERVER-side, exactly like any other producer on
  * the wire. Bulk loads that own the broker's storage keep using
  * [[graft.sources.Broker.produce]] (executor-side segment writes, no
  * socket hop); this sink is for producing into a broker you can only
  * reach over TCP.
  *
  * Input columns: `mvalue` (binary, required), optional `mkey`
  * (binary) and `ts_ms` (long, default 0 — the reference ENGINE's
  * produce takes the caller's timestamp, `topic.rs` Message; its
  * NETWORK listener stamps server time instead, which is quirk
  * territory — see `quirkCompat` below).
  *
  * Delivery is AT-LEAST-ONCE: a failed micro-batch is retried by the
  * engine and re-produces its rows — the log is append-only and the
  * reference has no idempotent-producer dedup (its produce assigns a
  * fresh offset unconditionally, `partition.rs` append). Downstream
  * exact dedup is the documented remedy, same as for any replayed
  * producer.
  *
  * Scale: one connection per input partition per batch (executor-side;
  * rows never pass the driver), produces sequentially on each — the
  * broker's single accept loop is the throughput ceiling, as it is for
  * the reference's own clients.
  */
object SocketProduce {

  /** `quirkCompat = true` targets a TRUE reference broker (r15 verdict
    * #2): its transport carries the raw value only — keys and headers
    * are dropped server-side (`listener.rs:91-96`) and the timestamp
    * is the SERVER's wall clock, so routing is always round-robin. A
    * frame with an `mkey` or `ts_ms` column is REJECTED at
    * construction rather than silently stripped of its routing/time
    * data. Engine-semantics mode (default) keeps key+timestamp on the
    * wire, as [[graft.protocol.FlyqServer]] stores them. */
  def socketProduceWriter(docs: DataFrame, host: String, port: Int,
                          topic: String, quirkCompat: Boolean = false,
                          readTimeoutMs: Int = 30000): DataStreamWriter[Row] = {
    val hasKey = docs.columns.contains("mkey")
    val hasTs = docs.columns.contains("ts_ms")
    if (quirkCompat && (hasKey || hasTs))
      throw new IllegalArgumentException(
        "quirkCompat=true cannot carry mkey/ts_ms: the reference " +
          "transport drops keys and stamps server time on network " +
          "Produce (listener.rs:91-96) — drop the columns to " +
          "acknowledge the loss, or produce to an engine-semantics " +
          "server")
    docs.writeStream.foreachBatch { (batch: Dataset[Row], _: Long) =>
      val cols = Seq(org.apache.spark.sql.functions.col("mvalue")) ++
        (if (hasKey) Seq(org.apache.spark.sql.functions.col("mkey"))
         else Nil) ++
        (if (hasTs) Seq(org.apache.spark.sql.functions.col("ts_ms"))
         else Nil)
      batch.select(cols: _*).foreachPartition {
        (rows: Iterator[Row]) =>
          if (rows.nonEmpty) {
            val client = new FlyqClient(host, port, quirkCompat, readTimeoutMs)
            try rows.foreach { r =>
              val value = r.getAs[Array[Byte]](0)
              // a null value would NPE deep in the codec and poison the
              // batch with an unnamed stack trace; name the column (the
              // row retries forever under at-least-once otherwise)
              if (value == null) throw new IllegalArgumentException(
                "socketProduceWriter: mvalue is null — filter null " +
                  "values out or encode an explicit empty payload")
              val key =
                if (hasKey) Option(r.getAs[Array[Byte]](1)).filter(_.nonEmpty)
                else None
              // null ts_ms follows the absent-column default (0)
              val ts = if (hasTs && !r.isNullAt(r.length - 1))
                r.getLong(r.length - 1) else 0L
              client.produce(topic, WireMessage(ts, key, value, Nil)) match {
                case Left(err) => throw new java.io.IOException(
                  s"produce($topic) failed: $err")
                case Right(_) => ()
              }
            } finally client.close()
          }
      }
    }
  }
}
