package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.LogModel

/** EXECUTABLE retention — the job that APPLIES the M1 decision
  * ([[BrokerOps.retentionFilter]] computes it; round-2/3 verdict: nothing
  * deleted files). Mirrors the reference's `Partition::enforce_retention`
  * (`partition.rs:225-308`, proven by `flyq-server/tests/retention.rs:9-197`):
  * whole evicted segments are deleted from disk oldest-first (time cutoff
  * OR size cap), the active segment always survives, and the persisted low
  * watermark is bumped to the first retained offset
  * (`partition.rs:271-289`).
  *
  * Scale shape: segment STATS are computed distributed (one task per
  * segment file via the binaryFile source — same granularity the
  * reference's recovery scan uses); only the per-segment decision table
  * (#segments rows, tiny) reaches the driver; deletes fan back out as a
  * parallelized metadata job. No data bytes ever funnel through one
  * process.
  */
object Retention {

  /** One row per segment with its decision. */
  case class SegmentDecision(partId: Long, baseOff: Long, path: String,
                             segBytes: Long, segMaxTs: Long, lastOff: Long,
                             active: Boolean, keep: Boolean)

  /** Distributed stats + decision (no mutation). `nowMs` defaults to the
    * newest record timestamp in the topic — deterministic, same convention
    * as [[BrokerOps.retentionFilter]]. `excludePaths` removes segments
    * from the planning universe entirely (used by
    * [[DeferredDelete.compactDeferred]] so already-retired segments are
    * neither re-retired nor counted against the size cap). */
  def plan(spark: SparkSession, baseDir: String, topic: String,
           retentionMs: Long = LogModel.RetentionDays * 86400000L,
           retentionBytes: Long = LogModel.RetentionBytes,
           nowMs: Option[Long] = None,
           excludePaths: Set[String] = Set.empty): Seq[SegmentDecision] = {
    val segStats0 = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.log")
      .load(s"$baseDir/topic_$topic/partition_*/")
      .select(col("path"), col("length"),
        graft.functions.FlyqCodec.flyq_decode_segment(col("content")).as("recs"))
      .withColumn("part_id",
        regexp_extract(col("path"), "partition_(\\d+)", 1).cast("long"))
      .withColumn("base_off",
        regexp_extract(col("path"), "segment_(\\d+)\\.log", 1).cast("long"))
      // explode_OUTER: a fully-torn/empty segment decodes to zero records
      // but must still appear in the decision table — with plain explode
      // it would be invisible (never evicted, uncounted by the size cap,
      // and the active-segment marker would shift to the wrong file)
      .select(col("part_id"), col("base_off"), col("path"),
        col("length").as("seg_bytes"), explode_outer(col("recs")).as("r"))
      .groupBy("part_id", "base_off", "path", "seg_bytes")
      .agg(max("r.ts_ms").as("seg_max_ts"), max("r.msg_offset").as("last_off"))
    val segStats = PlanGuard.boundedCollect(segStats0, "Retention.plan")
      .filterNot(r => excludePaths(r.getAs[String]("path")))
    if (segStats.isEmpty) return Seq.empty
    def tsOf(r: org.apache.spark.sql.Row): Long = {
      val i = r.fieldIndex("seg_max_ts")
      if (r.isNullAt(i)) Long.MinValue else r.getLong(i) // recordless = stale
    }
    val allTs = segStats.map(tsOf).filter(_ != Long.MinValue)
    val now = nowMs.getOrElse(if (allTs.isEmpty) 0L else allTs.max)
    val cutoff = now - retentionMs

    segStats.groupBy(_.getAs[Long]("part_id")).toSeq.flatMap {
      case (partId, rows) =>
        // newest → oldest, as the reference walks them (`partition.rs:241`)
        val newestFirst = rows.sortBy(-_.getAs[Long]("base_off"))
        var cumBytes = 0L
        newestFirst.zipWithIndex.map { case (r, i) =>
          cumBytes += r.getAs[Long]("seg_bytes")
          val active = i == 0 // highest base offset = the write head
          val keep = active ||
            (tsOf(r) >= cutoff && cumBytes <= retentionBytes)
          val lastOffIdx = r.fieldIndex("last_off")
          SegmentDecision(partId, r.getAs[Long]("base_off"),
            r.getAs[String]("path"), r.getAs[Long]("seg_bytes"), tsOf(r),
            if (r.isNullAt(lastOffIdx)) r.getAs[Long]("base_off") - 1
            else r.getLong(lastOffIdx),
            active, keep)
        }
    }
  }

  /** Apply the plan: delete evicted `.log`/`.index` files (distributed
    * metadata job) and persist the bumped low watermark per partition.
    * Returns the decisions it acted on. Idempotent: a second run sees only
    * retained segments and evicts nothing. */
  def compact(spark: SparkSession, baseDir: String, topic: String,
              retentionMs: Long = LogModel.RetentionDays * 86400000L,
              retentionBytes: Long = LogModel.RetentionBytes,
              nowMs: Option[Long] = None): Seq[SegmentDecision] = {
    // exclude already-RETIRED segments (r17 lifecycle review #1): a
    // retired segment has left the log and its file's lifecycle belongs
    // to the lease-gated [[DeferredDelete.reap]] — hard-deleting it here
    // would unlink it under readers whose leases the deferred protocol
    // promised to honor (the composition FlyqBrokerMain creates runs
    // THIS compact on topics whose readers may hold v2-source leases),
    // and its bytes would wrongly count against the size cap, evicting
    // newer live segments
    val retiredPaths =
      DeferredDelete.retired(spark, baseDir, topic).map(_.path).toSet
    val decisions = plan(spark, baseDir, topic, retentionMs, retentionBytes,
      nowMs, excludePaths = retiredPaths)
    val evicted = decisions.filterNot(_.keep)
    if (evicted.nonEmpty) {
      val confMap = spark.sessionState.newHadoopConf().iterator()
      val m = scala.collection.mutable.Map.empty[String, String]
      while (confMap.hasNext) { val e = confMap.next(); m(e.getKey) = e.getValue }
      val confB = spark.sparkContext.broadcast(m.toMap)
      spark.sparkContext.parallelize(evicted.map(_.path), evicted.size)
        .foreach { p =>
          val path = new Path(p)
          val fs = path.getFileSystem(
            graft.sources.v2.FlyqMicroBatchStream.confFromMap(confB.value))
          fs.delete(path, false)
          fs.delete(new Path(p.replaceAll("\\.log$", ".index")), false)
        }
    }
    // low watermark bump (`partition.rs:285`): persisted as the
    // reference's per-partition meta.json snapshot (three watermarks,
    // atomic tmp+rename — `partiton_meta.rs:8-13,27-40`); tiny
    // per-partition writes, driver-side
    decisions.filter(_.keep).groupBy(_.partId).foreach {
      case (partId, kept) =>
        Meta.write(spark, s"$baseDir/topic_$topic/partition_$partId",
          lowWatermark = kept.map(_.baseOff).min,
          highWatermark = kept.map(_.lastOff).max,
          logEndOffset = kept.map(_.lastOff).max + 1)
    }
    decisions
  }

  /** Persisted low watermark for a partition (None before any compaction). */
  def lowWatermark(spark: SparkSession, baseDir: String, topic: String,
                   partId: Long): Option[Long] =
    Meta.read(spark, s"$baseDir/topic_$topic/partition_$partId")
      .map(_._1)

  /** The reference's `meta.json` snapshot (`partiton_meta.rs:8-13`):
    * `{"log_end_offset":N,"low_watermark":N,"high_watermark":N}`, written
    * atomically via tmp + rename (`partiton_meta.rs:27-40`) so a crashed
    * writer can never leave a torn snapshot. */
  object Meta {
    /** Publish via [[DeferredDelete.atomicWriteMeta]] (r17 lifecycle
      * review #5): the raw-filesystem tmp+rename path. Writing through
      * the CHECKSUMMED LocalFileSystem and renaming via FileContext
      * leaves the `.crc` sidecar out of sync with the renamed data
      * file, so a concurrent read (a lag monitor racing a Maintenance
      * pass) dies with ChecksumException — the exact observed failure
      * DeferredDelete's metaFs comment documents. */
    def write(spark: SparkSession, partitionDir: String, lowWatermark: Long,
              highWatermark: Long, logEndOffset: Long): Unit =
      DeferredDelete.atomicWriteMeta(
        new Path(s"$partitionDir/meta.json"),
        spark.sessionState.newHadoopConf(),
        (s"""{"log_end_offset":$logEndOffset,"low_watermark":$lowWatermark,""" +
          s""""high_watermark":$highWatermark}""").getBytes("UTF-8"))

    /** (low, high, logEnd) if a snapshot exists. */
    def read(spark: SparkSession,
             partitionDir: String): Option[(Long, Long, Long)] =
      DeferredDelete.readMeta(new Path(s"$partitionDir/meta.json"),
        spark.sessionState.newHadoopConf()).flatMap { text =>
        def field(name: String): Option[Long] =
          ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r
            .findFirstMatchIn(text).map(_.group(1).toLong)
        for {
          low <- field("low_watermark")
          high <- field("high_watermark")
          end <- field("log_end_offset")
        } yield (low, high, end)
      }
  }

  /** On-disk watermark triple per partition, respecting persisted low
    * watermarks — the file-layout twin of `LogModel.watermarks`. */
  def watermarksOnDisk(spark: SparkSession, baseDir: String,
                       topic: String): Map[Long, (Long, Long, Long)] = {
    val highs0 = graft.sources.SegmentFiles.readTopic(spark, baseDir, topic)
      .groupBy("part_id")
      .agg(min("msg_offset").as("mn"), max("msg_offset").as("mx"))
    val highs = PlanGuard.boundedCollect(highs0, "Retention.watermarksOnDisk")
    highs.map { r =>
      val p = r.getAs[Long]("part_id")
      val low = lowWatermark(spark, baseDir, topic, p)
        .getOrElse(r.getAs[Long]("mn"))
      p -> ((low, r.getAs[Long]("mx"), r.getAs[Long]("mx") + 1))
    }.toMap
  }
}
