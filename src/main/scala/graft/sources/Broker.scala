package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.FlyqCodec
import graft.model.LogModel
import graft.plans.OrderedIndex

/** Distributed produce facade (W1, reference `log_engine.rs:60-70`):
  * routes a DataFrame of messages into topic partitions and writes
  * FlyQ-format segment files FROM THE EXECUTORS — round 1 only had a
  * driver-side `Seq[Record]` writer, which caps ingest at one process.
  *
  * Routing reproduces `Topic::produce` (`topic.rs:76-93`): keyed messages
  * by `(xxh3_64(key) as u32) % n` — the hash truncated to u32 before the
  * mod, exactly `hash_key_to_partition` (`topic.rs:90-93`) — the REAL
  * XXH3 via the golden-vector-verified [[graft.functions.Xxh3]]
  * expression (ProduceSpec pins placement against the reference rule
  * computed from the raw hash, independent of `partitionOf`), keyless
  * messages round-robin over the deterministic arrival order.
  *
  * Scale shape: one global two-phase index (arrival order), one per-group
  * index (offsets), one hash repartition by part_id — each topic partition
  * lands in exactly one task, which rolls segments at `segMaxBytes` with
  * the countdown sparse index, exactly like `Partition::append` +
  * `Segment::append` (`partition.rs:107-142`, `segment.rs:106-154`).
  * Headers are not routed (the reference's network produce drops them too,
  * `listener.rs:91-96`).
  */
object Broker {

  /** `df` schema: mkey binary (nullable), mvalue binary, ts_ms long, plus
    * the `orderCols` that define arrival order. `orderCols` MUST be a
    * total order (include a unique tiebreaker): ties would make arrival
    * indices — and therefore routing and offsets — nondeterministic across
    * stage retries, so there is deliberately no default.
    *
    * APPENDS to an existing topic (like the reference — `Partition::append`
    * continues from the recovered log end): per-partition base offsets are
    * read from the existing layout (segment file names, a metadata-only
    * listing, + one tail decode per partition for the last offset) and the
    * batch's dense indices continue from there. Each batch opens fresh
    * segments at its base offsets — a valid layout (readers chain segments
    * by base offset), chosen over tail-appending so a failed batch can
    * never tear an existing file. */
  def produce(df: DataFrame, baseDir: String, topic: String,
              orderCols: Seq[String],
              numPartitions: Int = LogModel.NumPartitions,
              segMaxBytes: Long = LogModel.SegmentMaxBytes,
              indexInterval: Int = SegmentFiles.IndexInterval): Unit = {
    // guard: a numPartitions below the existing layout would re-route
    // every key mod the smaller count AND never recover the higher
    // partitions' offsets — per-key history silently splits and strands
    // (r17 data-plane review #1). The partition count is a topic-creation
    // constant here as in the reference (config-owned, `topic.rs:30-35`).
    val topicDir = Paths.get(baseDir, s"topic_$topic")
    if (Files.isDirectory(topicDir)) {
      val s = Files.list(topicDir)
      val maxId =
        try s.toArray.map(_.toString)
          .flatMap("partition_(\\d+)$".r.findFirstMatchIn(_))
          .map(_.group(1).toLong).foldLeft(-1L)(math.max)
        finally s.close()
      require(maxId < numPartitions,
        s"topic '$topic' has partition_$maxId on disk but " +
          s"numPartitions=$numPartitions: appending with a smaller " +
          "partition count would re-route keys and silently strand the " +
          "higher partitions — pass the topic's original partition count")
    }
    // recover per-partition next offsets (reference `partition.rs:180-205`
    // recovery): driver-side listing + ONE streaming tail-segment chain
    // scan per partition — O(partitions) work, O(1) memory (the shared
    // SegmentFiles.scanChainStats; an eager readAllBytes here allocated
    // the whole tail segment on the driver, r17 data-plane review #4)
    val baseOffsets: Map[Long, Long] = (0L until numPartitions.toLong).flatMap { p =>
      val dir = Paths.get(baseDir, s"topic_$topic", s"partition_$p")
      SegmentFiles.segmentBases(dir).lastOption.map { base =>
        val (count, lastOff, _) = SegmentFiles.scanChainStats(
          dir.resolve(f"segment_$base%020d.log"))
        p -> (if (count == 0) base else lastOff + 1)
      }
    }.toMap
    produceFrom(df, baseDir, topic, orderCols, baseOffsets, numPartitions,
      segMaxBytes, indexInterval)
  }

  private def produceFrom(df: DataFrame, baseDir: String, topic: String,
                          orderCols: Seq[String],
                          baseOffsets: Map[Long, Long],
                          numPartitions: Int,
                          segMaxBytes: Long,
                          indexInterval: Int): Unit = {
    // keyless messages cycle over THEIR OWN dense arrival sequence (the
    // reference's counter increments only per keyless produce,
    // `topic.rs:79-83`) — pmod over the global index would skew whenever
    // keyless arrivals stride with numPartitions. The keyless index is the
    // exclusive prefix SUM of a 0/1 indicator over the global arrival
    // order, so it folds into one two-phase pass instead of a third one.
    val withRR = OrderedIndex.withExclusivePrefix(
      df.withColumn("keyless_val",
        when(col("mkey").isNull, lit(1L)).otherwise(lit(0L))),
      Seq.empty, orderCols, Some("keyless_val"), "keyless_idx")
    // rotate the batch's round-robin START by the recovered log ends:
    // restarting the cycle at 0 every batch would systematically favor
    // low partitions across many small keyless batches (the reference's
    // in-memory counter carries across produces, `topic.rs:79-83`; this
    // deterministic rotation is the batch equivalent)
    val rrStart = baseOffsets.values.sum % numPartitions
    val routed = withRR.withColumn("part_id",
      when(col("mkey").isNull,
        pmod(col("keyless_idx") + lit(rrStart), lit(numPartitions.toLong)))
        .otherwise(graft.functions.Xxh3.xxh3_partition(col("mkey"),
          numPartitions.toLong))
        .cast("long"))
    // per-partition recovered bases fold into a literal CASE expression
    // (numPartitions entries — tiny); empty map = fresh topic = offset 0
    val baseExpr = baseOffsets.foldLeft(lit(0L)) { case (acc, (p, b)) =>
      when(col("part_id") === p, lit(b)).otherwise(acc)
    }
    val withOffsets = OrderedIndex.withExclusivePrefix(
        routed, Seq("part_id"), orderCols, None, "batch_idx")
      .withColumn("msg_offset", col("batch_idx") + baseExpr)

    withOffsets
      .repartition(numPartitions, col("part_id"))
      .sortWithinPartitions("part_id", "msg_offset")
      .select("part_id", "msg_offset", "ts_ms", "mkey", "mvalue")
      .foreachPartition { it: Iterator[Row] =>
        var writer: SegmentWriter = null
        // try/finally: an append failure mid-iterator must still close
        // the current writer's streams — in a long-lived executor leaked
        // buffered streams hold fds (and unflushed index bytes) until GC
        // while the task retry rewrites the same filenames
        try it.foreach { r =>
          val partId = r.getLong(0)
          if (writer == null || writer.partId != partId) {
            if (writer != null) { writer.close(); writer = null }
            writer = new SegmentWriter(baseDir, topic, partId, segMaxBytes,
              indexInterval)
          }
          writer.append(r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3),
            r.getAs[Array[Byte]](4))
        } finally if (writer != null) writer.close()
      }
  }

  /** Executor-side rolling segment writer: greedy pre-append rotation like
    * the reference (`partition.rs:117-127` — rotate before an append that
    * would overflow a non-empty segment). */
  private final class SegmentWriter(baseDir: String, topic: String,
                                    val partId: Long, segMaxBytes: Long,
                                    indexInterval: Int) {
    private val dir = Paths.get(baseDir, s"topic_$topic", s"partition_$partId")
    Files.createDirectories(dir)
    private var out: BufferedOutputStream = _
    private var idx: BufferedOutputStream = _
    private var segBytes = 0L
    private var appended = 0

    private def open(baseOffset: Long): Unit = {
      out = new BufferedOutputStream(new FileOutputStream(
        dir.resolve(f"segment_$baseOffset%020d.log").toFile))
      idx = new BufferedOutputStream(new FileOutputStream(
        dir.resolve(f"segment_$baseOffset%020d.index").toFile))
      segBytes = 0L
      appended = 0
    }

    def append(offset: Long, tsMs: Long, key: Array[Byte],
               value: Array[Byte]): Unit = {
      val bytes = FlyqCodec.encodeRecord(offset, key, value, tsMs, null)
      if (out == null) open(offset)
      else if (segBytes > 0 && segBytes + bytes.length > segMaxBytes) {
        close(); open(offset)
      }
      if (appended % indexInterval == 0) {
        val e = ByteBuffer.allocate(16)
        e.putLong(offset); e.putLong(segBytes)
        idx.write(e.array())
      }
      appended += 1
      out.write(bytes)
      segBytes += bytes.length
    }

    /** Idempotent; closes BOTH streams even when the log stream's close
      * (buffered flush) throws — `out.close(); idx.close()` leaked the
      * index stream on a full-disk flush failure. */
    def close(): Unit = {
      val o = out
      val i = idx
      out = null
      idx = null
      if (o != null) try o.close() finally i.close()
    }
  }
}
