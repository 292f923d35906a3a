package graft.operators

import java.nio.ByteBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FlyqCodec
import graft.sources.SegmentFiles

/** EXECUTABLE key compaction — applies the [[BrokerOps.logCompaction]]
  * decision (highest offset per (partition, key) survives) to the on-disk
  * segment layout, Kafka-log-cleaner style (public semantics: retain a
  * record iff no later record with the same key exists anywhere in the
  * partition log; keep original offsets, so compacted logs have gaps;
  * never touch the active segment; a winning zero-length/null value is a
  * tombstone and is removed from compacted segments).
  *
  * The reference itself stops at time/size retention
  * (`partition.rs:225-308` — executed by [[Retention]]); key compaction is
  * the beyond-reference maintenance op a keyed changelog topic needs so
  * the log's footprint is O(live keys), not O(total produces).
  *
  * Scale shape: one scan (one task per segment file), ONE shuffle on
  * (part_id, mkey) — the log's own locality key — for the winner table, a
  * semi-join back (same key prefix, so it co-partitions with the winner
  * aggregate), and one writer task per output segment. The only
  * driver-side state is the per-segment decision table (#segments rows).
  * Rewrites go to `segment_N.log.tmp` + atomic rename, so a crashed
  * cleaner never tears a segment readers are chaining through — the same
  * posture as [[Retention.Meta.write]].
  */
object Compaction {

  /** Per-segment outcome. `recordsBefore/After` count decoded records;
    * `action` is one of keep (untouched), rewrite, delete, active. */
  case class SegmentOutcome(partId: Long, baseOff: Long, path: String,
                            recordsBefore: Long, recordsAfter: Long,
                            action: String)

  /** Decoded records of every NON-ACTIVE segment, with survivor marking.
    * Exposed for tests; `compactKeys` is the mutating entry point. */
  private def survivorFrame(recs: DataFrame): DataFrame = {
    // keyless records can never be shadowed (no key to match) — they are
    // unconditional survivors, and must NOT fold into one NULL group in
    // the winner aggregate
    val keyed = recs.filter(col("mkey").isNotNull)
    val winners = keyed
      .groupBy("part_id", "mkey")
      .agg(max("msg_offset").as("keep_off"),
        max_by(length(col("mvalue")), col("msg_offset")).as("keep_len"))
    // a winner whose value is NULL/empty is a tombstone: the key is dead,
    // so even its final version is dropped from compacted segments
    val liveWinners = winners
      .filter(col("keep_len").isNotNull && col("keep_len") > 0)
      .select(col("part_id").as("w_part"), col("mkey").as("w_key"),
        col("keep_off"))
    keyed.join(liveWinners,
        col("part_id") === col("w_part") && col("mkey") === col("w_key") &&
          col("msg_offset") === col("keep_off"),
        "left_semi")
      .unionByName(recs.filter(col("mkey").isNull))
  }

  /** Compact every partition of `topic` under `baseDir`. Idempotent: a
    * second run finds every non-active segment already fully live and
    * rewrites nothing. Returns one row per non-active segment with the
    * action taken. */
  def compactKeys(spark: SparkSession, baseDir: String,
                  topic: String): Seq[SegmentOutcome] = {
    // metadata-only listing (content column never selected, so binaryFile
    // reads no bytes) — the active segment per partition is the highest
    // base offset, present even when it decodes to zero records
    val segList0 = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.log")
      .load(s"$baseDir/topic_$topic/partition_*/")
      .select(col("path"),
        regexp_extract(col("path"), "partition_(\\d+)", 1).cast("long")
          .as("part_id"),
        regexp_extract(col("path"), "segment_(\\d+)\\.log", 1).cast("long")
          .as("base_off"))
    val segList = PlanGuard
      .boundedCollect(segList0, "Compaction.compactKeys segment listing")
      .map(r => (r.getLong(1), r.getLong(2), r.getString(0)))
    if (segList.isEmpty) return Seq.empty
    val activeBase: Map[Long, Long] =
      segList.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).max }

    // compaction scope: all records, so the active segment's records DO
    // shadow older versions — but only non-active segments are rewritten.
    // Segment-set predicates are broadcast anti/semi-joins on a
    // (#segments)-row frame, NOT literal CASE chains: a 100 TB topic has
    // thousands of segments and a thousand-node when-chain is a
    // plan-sized expression the optimizer has to walk per rule.
    import spark.implicits._
    val activeDf = broadcast(
      activeBase.toSeq.toDF("part_id", "base_off"))
    def dropActive(df: DataFrame): DataFrame =
      df.join(activeDf, Seq("part_id", "base_off"), "left_anti")
    val recs = SegmentFiles.readTopic(spark, baseDir, topic)
    val nonActive = dropActive(recs)
    // persisted for the job's duration: the winner shuffle + semi-join is
    // the expensive stage, and both the decision counts and the rewrite
    // job consume it — without the persist it would run twice
    val survivors = dropActive(survivorFrame(recs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try compactWith(spark, nonActive, survivors, activeBase, segList)
    finally survivors.unpersist(blocking = false)
  }

  private def compactWith(spark: SparkSession, nonActive: DataFrame,
                          survivors: DataFrame,
                          activeBase: Map[Long, Long],
                          segList: Array[(Long, Long, String)])
      : Seq[SegmentOutcome] = {
    import spark.implicits._
    // per-segment decision table (#segments rows — tiny): equal counts
    // means the survivor subset is the whole segment, so skip the rewrite
    val before = nonActive.groupBy("part_id", "base_off")
      .agg(count(lit(1)).as("n_before"))
    val after = survivors.groupBy("part_id", "base_off")
      .agg(count(lit(1)).as("n_after"))
    val decisions = PlanGuard.boundedCollect(
        before.join(after, Seq("part_id", "base_off"), "left")
          .select(col("part_id"), col("base_off"),
            col("n_before"), coalesce(col("n_after"), lit(0L)).as("n_after")),
        "Compaction decision table")
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap

    val pathOf: Map[(Long, Long), String] =
      segList.map(s => ((s._1, s._2), s._3)).toMap
    val toRewrite = decisions.filter { case (_, (b, a)) => a > 0 && a < b }.keySet
    val toDelete = decisions.filter { case (_, (_, a)) => a == 0 }.keySet

    if (toRewrite.nonEmpty) {
      val rewriteDf = broadcast(
        toRewrite.toSeq.toDF("part_id", "base_off"))
      val confB = broadcastHadoopConf(spark)
      val paths = pathOf // serializable capture, not the outer method
      survivors.join(rewriteDf, Seq("part_id", "base_off"), "left_semi")
        .repartition(col("part_id"), col("base_off"))
        .sortWithinPartitions("part_id", "base_off", "msg_offset")
        .select("part_id", "base_off", "msg_offset", "ts_ms", "mkey",
          "mvalue", "headers")
        .foreachPartition { it: Iterator[Row] =>
          var cur: (Long, Long) = null
          var w: HdfsSegmentWriter = null
          it.foreach { r =>
            val seg = (r.getLong(0), r.getLong(1))
            if (cur == null || cur != seg) {
              if (w != null) w.commit()
              w = new HdfsSegmentWriter(paths(seg), confB.value)
              cur = seg
            }
            w.append(r.getLong(2), r.getLong(3),
              if (r.isNullAt(4)) null else r.getAs[Array[Byte]](4),
              if (r.isNullAt(5)) null else r.getAs[Array[Byte]](5),
              if (r.isNullAt(6)) null else r.getSeq[Row](6))
          }
          if (w != null) w.commit()
        }
    }
    if (toDelete.nonEmpty) {
      val confB = broadcastHadoopConf(spark)
      spark.sparkContext
        .parallelize(toDelete.toSeq.map(pathOf), toDelete.size)
        .foreach { p =>
          val path = new Path(p)
          val fs = path.getFileSystem(
            graft.sources.v2.FlyqMicroBatchStream.confFromMap(confB.value))
          fs.delete(path, false)
          fs.delete(new Path(p.replaceAll("\\.log$", ".index")), false)
        }
    }

    segList.filterNot { case (p, b, _) => activeBase(p) == b }
      .map { case (p, b, path) =>
        val (nb, na) = decisions.getOrElse((p, b), (0L, 0L))
        val action =
          if (toDelete((p, b))) "delete"
          else if (toRewrite((p, b))) "rewrite"
          else "keep"
        SegmentOutcome(p, b, path, nb, na, action)
      }.sortBy(o => (o.partId, o.baseOff)).toSeq
  }

  private def broadcastHadoopConf(spark: SparkSession) = {
    val it = spark.sessionState.newHadoopConf().iterator()
    val m = scala.collection.mutable.Map.empty[String, String]
    while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue }
    spark.sparkContext.broadcast(m.toMap)
  }

  /** Executor-side rewrite of ONE segment: stream records to
    * `<path>.tmp` (+ fresh countdown sparse index, same rule as
    * [[SegmentFiles.writeSegment]]), then atomically rename both over the
    * originals. The filename keeps the ORIGINAL base offset even though
    * the first surviving record may sit above it — Kafka keeps segment
    * base names too, and every reader chains by filename base. */
  private final class HdfsSegmentWriter(logPath: String,
                                        conf: Map[String, String]) {
    private val fsConf = graft.sources.v2.FlyqMicroBatchStream.confFromMap(conf)
    private val dst = new Path(logPath)
    private val dstIdx = new Path(logPath.replaceAll("\\.log$", ".index"))
    private val tmp = new Path(logPath + ".tmp")
    private val tmpIdx = new Path(logPath + ".index.tmp")
    private val fs = dst.getFileSystem(fsConf)
    private val out = fs.create(tmp, true)
    private val idx = fs.create(tmpIdx, true)
    private var appended = 0

    def append(offset: Long, tsMs: Long, key: Array[Byte],
               value: Array[Byte], headers: Seq[Row]): Unit = {
      val hdrs =
        if (headers == null || headers.isEmpty) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(
          headers.map { h =>
            org.apache.spark.sql.catalyst.InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                h.getString(0)),
              h.getAs[Array[Byte]](1))
          }.toArray[Any])
      val bytes = FlyqCodec.encodeRecord(offset, key, value, tsMs, hdrs)
      if (appended % SegmentFiles.IndexInterval == 0) {
        val e = ByteBuffer.allocate(16)
        e.putLong(offset); e.putLong(out.getPos)
        idx.write(e.array())
      }
      appended += 1
      out.write(bytes)
    }

    def commit(): Unit = {
      out.close(); idx.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, fsConf)
      fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      fc.rename(tmpIdx, dstIdx, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }
}
