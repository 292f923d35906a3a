package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.FlyqCodec

/** Structured Streaming ingestion of FlyQ-format segment files — the
  * Spark-native replacement for the reference's consume lifecycle
  * (SURVEY.md §3.2): instead of a TCP listener + per-connection tasks
  * funneling through a global engine mutex, a file stream source discovers
  * newly-rolled segment files per micro-batch, decodes them in parallel
  * tasks, and checkpoints progress — no shared lock anywhere.
  *
  * Scale posture: one input partition per new segment file per batch;
  * decode is a narrow map (no shuffle); downstream aggregations get
  * watermark-bounded state. At 1000 executors this ingests as fast as the
  * filesystem can list+read.
  */
object LogStream {

  /** binaryFile's fixed schema (needed explicitly for readStream). */
  private val binaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Stream of decoded records from a FlyQ topic directory:
    * (part_id, base_off, msg_offset, ts_ms, mkey, mvalue, headers). */
  def readSegments(spark: SparkSession, baseDir: String, topic: String): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.log")
      .load(s"$baseDir/topic_$topic/partition_*/")
      .select(col("path"), FlyqCodec.flyq_decode_segment(col("content")).as("recs"))
      .withColumn("part_id",
        regexp_extract(col("path"), "partition_(\\d+)", 1).cast("long"))
      .withColumn("base_off",
        regexp_extract(col("path"), "segment_(\\d+)\\.log", 1).cast("long"))
      .select(col("part_id"), col("base_off"), explode(col("recs")).as("r"))
      .select(col("part_id"), col("base_off"), col("r.*"))

  /** CONTINUOUS consumer lag — the flagship query as a live stream (the
    * reference's monitor example polls GetConsumerLag in a loop,
    * `monitor.rs:54-77`; this is the push twin). The tailing source feeds
    * a running high-watermark aggregate per partition; committed offsets
    * arrive as a per-(group, partition) map (in production: a
    * slowly-changing table the sink joins or a second stream). Complete
    * output mode — state is one row per partition, bounded by topology,
    * not data. */
  def consumerLag(records: DataFrame,
                  committed: Map[(String, Long), Long]): DataFrame = {
    // cold start: no commits → plan a validly-typed empty stream (an
    // array() literal would be NullType and fail analysis)
    if (committed.isEmpty)
      return records.groupBy(col("part_id"))
        .agg(max(col("msg_offset")).as("high_off"))
        .select(lit("").as("grp"), col("part_id"), lit(0L).as("committed"),
          col("high_off"), lit(0L).as("lag"))
        .filter(lit(false))
    // ONE global aggregate with a conditional max per committed partition
    // (topology-bounded columns; streaming allows a single aggregation,
    // so a per-partition groupBy could not be re-joined with entries for
    // partitions that have no records yet) — then entries project against
    // it, so a record-less (group, partition) still emits lag 0 instead
    // of vanishing, like the reference monitor reporting every requested
    // partition
    val parts = committed.keys.map(_._2).toSeq.distinct.sorted
    val aggs = parts.map(p =>
      max(when(col("part_id") === p, col("msg_offset"))).as(s"high_$p"))
    val entries = committed.toSeq.map { case ((grp, part), off) =>
      struct(lit(grp).as("grp"), lit(part).as("c_part"),
        lit(off).as("committed"))
    }
    val highExpr = parts.foldLeft(lit(null).cast("bigint")) { (acc, p) =>
      when(col("c.c_part") === p, col(s"high_$p")).otherwise(acc)
    }
    records
      .groupBy()
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("c", explode(array(entries: _*)))
      .select(col("c.grp").as("grp"), col("c.c_part").as("part_id"),
        col("c.committed").as("committed"),
        coalesce(highExpr, lit(-1L)).as("high_off"))
      .withColumn("lag",
        greatest(col("high_off") - col("committed"), lit(0L)))
  }

  /** Streaming twin of Relational.eventsHourly: event-time tumbling window
    * with a watermark bounding state (NOT the reference's offset watermark —
    * SURVEY.md §2.7 naming discipline). */
  def windowedCounts(records: DataFrame): DataFrame =
    records
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("part_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("part_id"), col("n_events"))
}
