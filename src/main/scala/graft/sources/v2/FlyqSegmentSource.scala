package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.FlyqCodec

/** DataSourceV2 micro-batch source that TAILS a FlyQ topic directory
  * (SURVEY.md §7.2 phase 6): the streaming-source analog of the reference's
  * consume lifecycle, playing the roles of `stream_from_offset` +
  * recovery replay (`partition.rs:144-165`, `segment.rs:188-265`) at the
  * planner level instead of behind a global engine mutex.
  *
  * Offset model: per segment file, the count of bytes fully processed —
  * `latestOffset` lists files and sizes (driver, metadata-only);
  * `planInputPartitions` diffs two offsets into (file, startPos, endPos)
  * splits, one task per grown/new segment. Bytes past the last decodable
  * record boundary in a split are skipped, exactly like the reference's
  * torn-tail recovery (stop at first parse failure).
  *
  * Unlike the `binaryFile` stand-in ([[graft.streaming.LogStream]]), this
  * source re-reads NOTHING when a segment grows: only the byte delta is
  * planned, so an active 1 GiB segment receiving appends costs only the new
  * bytes per batch.
  */
class FlyqSegmentSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlyqSegmentSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FlyqSegmentTable(opts.get("path"), Option(opts.get("topic")))
  }
}

object FlyqSegmentSource {
  /** Output schema — same shape as SegmentFiles.readTopic / LogStream. */
  val schema: StructType = StructType(Seq(
    StructField("part_id", LongType, nullable = false),
    StructField("base_off", LongType, nullable = false)) ++
    FlyqCodec.recordType.fields)

  val PartitionRe = ".*partition_(\\d+).*".r
  val SegmentRe = ".*segment_(\\d+)\\.log".r
}

class FlyqSegmentTable(path: String, topic: Option[String])
    extends Table with SupportsRead {
  require(path != null, "flyq-segments source requires a path")
  override def name(): String = s"flyq-segments(`$path`, topic=$topic)"
  override def schema(): StructType = FlyqSegmentSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FlyqScan(path, topic)
}

class FlyqScan(path: String, topic: Option[String]) extends Scan {
  override def readSchema(): StructType = FlyqSegmentSource.schema
  override def description(): String = s"FlyqScan($path)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FlyqMicroBatchStream(path, topic)
}

/** Offset = per-file processed byte counts, JSON `{"path":bytes,...}`. */
case class FlyqOffset(fileBytes: Map[String, Long]) extends Offset {
  override def json(): String =
    fileBytes.toSeq.sortBy(_._1).map { case (p, n) =>
      "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + n
    }.mkString("{", ",", "}")
}

object FlyqOffset {
  private val Entry = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\\d+)".r
  def fromJson(json: String): FlyqOffset =
    FlyqOffset(Entry.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2).toLong
    }.toMap)
}

class FlyqMicroBatchStream(path: String, topic: Option[String])
    extends MicroBatchStream {

  private def listSegments(): Map[String, Long] = {
    val glob = topic match {
      case Some(t) => s"$path/topic_$t/partition_*/segment_*.log"
      case None => s"$path/topic_*/partition_*/segment_*.log"
    }
    val hadoopConf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(glob)
    val fs = p.getFileSystem(hadoopConf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    statuses.map(s => s.getPath.toUri.getPath -> s.getLen).toMap
  }

  override def initialOffset(): Offset = FlyqOffset(Map.empty)
  override def latestOffset(): Offset = FlyqOffset(listSegments())
  override def deserializeOffset(json: String): Offset = FlyqOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FlyqOffset].fileBytes
    val e = end.asInstanceOf[FlyqOffset].fileBytes
    e.toSeq.sortBy(_._1).flatMap { case (file, endPos) =>
      val startPos = s.getOrElse(file, 0L)
      if (endPos <= startPos) None
      else {
        val partId = file match {
          case FlyqSegmentSource.PartitionRe(p) => p.toLong
          case _ => -1L
        }
        val baseOff = file match {
          case FlyqSegmentSource.SegmentRe(b) => b.toLong
          case _ => -1L
        }
        Some(FlyqInputPartition(file, startPos, endPos, partId, baseOff))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new FlyqPartitionReader(p.asInstanceOf[FlyqInputPartition])
    }
}

case class FlyqInputPartition(file: String, startPos: Long, endPos: Long,
                              partId: Long, baseOff: Long) extends InputPartition

/** Reads the byte delta [startPos, endPos) of one segment file, decoding
  * sequential StoredRecords; stops cleanly at a torn tail. */
class FlyqPartitionReader(split: FlyqInputPartition)
    extends PartitionReader[InternalRow] {

  private val bytes: Array[Byte] = {
    val hadoopConf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(split.file)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    try {
      val len = (split.endPos - split.startPos).toInt
      val buf = new Array[Byte](len)
      in.seek(split.startPos)
      in.readFully(buf, 0, len)
      buf
    } finally in.close()
  }

  private var pos = 0
  private var row: InternalRow = _
  private var done = false

  override def next(): Boolean = {
    if (done || pos + 4 > bytes.length) return false
    try {
      val (rec, nextPos) = FlyqCodec.decodeRecordAt(bytes, pos)
      pos = nextPos
      val out = new GenericInternalRow(7)
      out.update(0, split.partId)
      out.update(1, split.baseOff)
      var i = 0
      while (i < 5) { out.update(2 + i, rec.get(i, FlyqCodec.recordType.fields(i).dataType)); i += 1 }
      row = out
      true
    } catch {
      case _: IllegalArgumentException | _: java.nio.BufferUnderflowException =>
        // torn tail: skip the undecodable remainder (reference recovery
        // semantics — stop replay at first parse failure)
        done = true
        false
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
