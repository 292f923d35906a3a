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
    val decisions = plan(spark, baseDir, topic, retentionMs, retentionBytes, nowMs)
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
    def write(spark: SparkSession, partitionDir: String, lowWatermark: Long,
              highWatermark: Long, logEndOffset: Long): Unit = {
      val conf = spark.sessionState.newHadoopConf()
      val tmp = new Path(s"$partitionDir/meta.json.tmp")
      val dst = new Path(s"$partitionDir/meta.json")
      val fs = dst.getFileSystem(conf)
      val out = fs.create(tmp, true)
      try out.write(
        (s"""{"log_end_offset":$logEndOffset,"low_watermark":$lowWatermark,""" +
          s""""high_watermark":$highWatermark}""").getBytes("UTF-8"))
      finally out.close()
      // FileContext rename with OVERWRITE is the actually-atomic form —
      // FileSystem.rename needs a delete-first (a crash in between loses
      // the previous snapshot entirely) and returns false on races
      org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    /** (low, high, logEnd) if a snapshot exists. */
    def read(spark: SparkSession,
             partitionDir: String): Option[(Long, Long, Long)] = {
      val p = new Path(s"$partitionDir/meta.json")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try {
            // drain fully — a single read() may legally return a short
            // count (FSDataInputStream on object stores does), which
            // would silently truncate the snapshot and drop fields
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](256)
            var n = in.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
            new String(bos.toByteArray, "UTF-8")
          } finally in.close()
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
