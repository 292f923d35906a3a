package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FlyqCodec

/** Reader/writer for the reference's on-disk layout
  * (`base_dir/topic_{name}/partition_{id}/segment_{base:020}.log` + sparse
  * `.index`; reference `topic.rs:21-26`, `segment.rs:54-60,106-154`).
  *
  * Reading is Spark-first: the `binaryFile` source lists segment files in
  * parallel (one task per file — exactly the reference's segment
  * granularity), `flyq_decode_segment` explodes each file into records, and
  * `part_id` is parsed from the directory name. Offset-range predicates
  * then prune whole files via the (base_offset-in-filename >= range) filter
  * before any byte is decoded — the Spark analog of the reference's
  * BTreeMap floor-seek (`partition.rs:144-165`).
  *
  * Scale note: one task per segment file is the right parallelism at 1 GiB
  * segments; the sparse `.index` is written for layout fidelity but unused
  * by reads (columnar row-group stats play that role on the parquet path).
  */
object SegmentFiles {

  case class Record(offset: Long, tsMs: Long, key: Array[Byte],
                    value: Array[Byte],
                    headers: Seq[(String, Array[Byte])] = Nil)

  val IndexInterval = 100 // reference constants.rs:3

  /** Segment base offsets in a partition dir, ascending. The single home
    * of the `segment_N.log` listing (server, broker recovery, and tests
    * all call this); closes the `Files.list` stream — an unclosed stream
    * leaks a directory handle per call.
    *
    * RETIRED segments are excluded (M2, `segment.rs:336`): a segment the
    * deferred-deletion manifest holds has left the log — exactly the
    * reference's removal from the in-memory BTreeMap — even though its
    * file survives until the last pre-retirement lease drops
    * ([[graft.operators.DeferredDelete]]). */
  def segmentBases(partitionDir: java.nio.file.Path): Seq[Long] = {
    if (!Files.isDirectory(partitionDir)) return Seq.empty
    val retiredOff: Set[Long] = {
      val name = partitionDir.getFileName.toString
      val topicDir = partitionDir.getParent
      if (topicDir == null || !name.startsWith("partition_")) Set.empty
      else {
        val partId = name.stripPrefix("partition_").toLong
        val topic = topicDir.getFileName.toString.stripPrefix("topic_")
        graft.operators.DeferredDelete
          .retiredBases(topicDir.getParent.toString, topic)
          .collect { case (p, b) if p == partId => b }
      }
    }
    val s = Files.list(partitionDir)
    try s.toArray.map(_.toString)
      .flatMap("segment_(\\d+)\\.log$".r.findFirstMatchIn(_))
      .map(_.group(1).toLong).filterNot(retiredOff).sorted.toSeq
    finally s.close()
  }

  /** Streaming length-chain scan of one segment file WITHOUT decoding or
    * materializing records: (record count, last offset or -1, valid byte
    * extent). The shared recovery primitive (server head seeding, broker
    * produce recovery): a 64 KiB buffered walk reading 12 bytes per
    * record — the eager `Files.readAllBytes` alternative allocated the
    * whole segment (1 GiB at production sizing) on the driver just to
    * find the last offset (r17 data-plane review #4). Body-corrupt
    * records count — they occupy offsets and resync via the outer length
    * chain; a torn tail ends the scan at the last complete record. */
  def scanChainStats(p: java.nio.file.Path): (Int, Long, Long) = {
    val size = Files.size(p)
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(p.toFile), 1 << 16))
    try {
      var pos = 0L; var count = 0; var last = -1L; var done = false
      while (!done && pos + 12 <= size) {
        val recLen = in.readInt()
        val off = in.readLong()
        if (recLen < 28 || pos + 4L + recLen > size) done = true
        else {
          in.skipNBytes(recLen - 8L)
          count += 1; last = off; pos += 4L + recLen
        }
      }
      (count, last, pos)
    } finally in.close()
  }

  /** Write one segment (.log + .index) under dir/topic_{t}/partition_{p}. */
  def writeSegment(baseDir: String, topic: String, partition: Int,
                   records: Seq[Record],
                   indexInterval: Int = IndexInterval): java.nio.file.Path = {
    require(records.nonEmpty)
    val dir = Paths.get(baseDir, s"topic_$topic", s"partition_$partition")
    Files.createDirectories(dir)
    val base = records.head.offset
    val logPath = dir.resolve(f"segment_$base%020d.log")
    val idxPath = dir.resolve(f"segment_$base%020d.index")
    val out = new BufferedOutputStream(new FileOutputStream(logPath.toFile))
    val idx = new BufferedOutputStream(new FileOutputStream(idxPath.toFile))
    var pos = 0L
    var appended = 0
    try records.foreach { r =>
      val headers = if (r.headers.isEmpty) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(
          r.headers.map { case (k, v) =>
            org.apache.spark.sql.catalyst.InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(k), v)
          }.toArray[Any])
      val bytes = FlyqCodec.encodeRecord(r.offset, r.key, r.value, r.tsMs, headers)
      // sparse index: first record of the segment, then every
      // index_interval-th APPEND relative to the segment (a countdown, NOT
      // offset % interval — reference segment.rs:142-154 should_index);
      // 16-byte BE entries
      if (appended % indexInterval == 0) {
        val e = ByteBuffer.allocate(16)
        e.putLong(r.offset); e.putLong(pos)
        idx.write(e.array())
      }
      appended += 1
      out.write(bytes)
      pos += bytes.length
    } finally {
      // nested finally: an IOException from out.close() (buffered flush
      // on a full disk) must not leak the index stream
      try out.close() finally idx.close()
    }
    logPath
  }

  /** Read every LIVE segment of a topic into a records DataFrame
    * (part_id, base_off, msg_offset, ts_ms, mkey, mvalue, headers).
    * Segments the deferred-deletion manifest retired are excluded BEFORE
    * decode (M2 — retirement removes a segment from every NEW read plan;
    * its bytes survive for pre-retirement leaseholders until
    * [[graft.operators.DeferredDelete.reap]]). */
  def readTopic(spark: SparkSession, baseDir: String, topic: String): DataFrame = {
    val retired = graft.operators.DeferredDelete
      .retired(spark, baseDir, topic)
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.log")
      .load(s"$baseDir/topic_$topic/partition_*/")
    val live =
      if (retired.isEmpty) raw
      else raw.filter(!col("path").isin(retired.map(_.path): _*))
    live
      .select(col("path"), FlyqCodec.flyq_decode_segment(col("content")).as("recs"))
      .withColumn("part_id",
        regexp_extract(col("path"), "partition_(\\d+)", 1).cast("long"))
      .withColumn("base_off",
        regexp_extract(col("path"), "segment_(\\d+)\\.log", 1).cast("long"))
      .select(col("part_id"), col("base_off"), explode(col("recs")).as("r"))
      .select(col("part_id"), col("base_off"), col("r.*"))
  }
}
