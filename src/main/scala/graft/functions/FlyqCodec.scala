package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact codec for the reference's on-disk record format
  * (reference `flyq-server/src/core/stored_record.rs:14-27` +
  * `flyq-protocol/src/message.rs:1-64`), as native Catalyst expressions:
  *
  * {{{
  * [ record_len : u32 ]  -- big-endian, = 8 + message body length
  * [ offset     : u64 ]
  * [ timestamp  : u64 ]  -- epoch millis
  * [ key_len    : u32 ][ key bytes ]     -- key_len == 0 encodes None
  * [ value_len  : u32 ][ value bytes ]
  * [ header_cnt : u32 ][ (k_len,k,v_len,v)* ]  -- header keys UTF-8
  * }}}
  *
  * Quirk preserved (message.rs:88-92): an empty key is indistinguishable
  * from a missing key — both encode as key_len=0 and decode as null.
  * Likewise an empty header list decodes as null (message.rs:124-129).
  */
object FlyqCodec {

  val headerType: StructType = StructType(Seq(
    StructField("hkey", StringType, nullable = false),
    StructField("hvalue", BinaryType, nullable = false)))

  /** Decoded StoredRecord schema — deliberately parallel to Spark's Kafka
    * source schema (key/value binary, timestamp, headers array). */
  val recordType: StructType = StructType(Seq(
    StructField("msg_offset", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("mkey", BinaryType, nullable = true),
    StructField("mvalue", BinaryType, nullable = false),
    StructField("headers", ArrayType(headerType, containsNull = false),
      nullable = true)))

  // ---- kernels (shared by eval and any future codegen path) ----

  def encodeRecord(offset: Long, key: Array[Byte], value: Array[Byte],
                   tsMs: Long, headers: ArrayData): Array[Byte] = {
    val v = if (value == null) Array.emptyByteArray else value
    var hlen = 0
    val n = if (headers == null) 0 else headers.numElements()
    var i = 0
    val hk = new Array[Array[Byte]](n)
    val hv = new Array[Array[Byte]](n)
    while (i < n) {
      val row = headers.getStruct(i, 2)
      hk(i) = row.getUTF8String(0).getBytes
      hv(i) = row.getBinary(1)
      hlen += 8 + hk(i).length + hv(i).length
      i += 1
    }
    val klen = if (key == null) 0 else key.length
    val bodyLen = 8 + 4 + klen + 4 + v.length + 4 + hlen
    val buf = ByteBuffer.allocate(4 + 8 + bodyLen) // big-endian by default
    buf.putInt(8 + bodyLen)
    buf.putLong(offset)
    buf.putLong(tsMs)
    buf.putInt(klen)
    if (klen > 0) buf.put(key)
    buf.putInt(v.length)
    buf.put(v)
    buf.putInt(n)
    i = 0
    while (i < n) {
      buf.putInt(hk(i).length); buf.put(hk(i))
      buf.putInt(hv(i).length); buf.put(hv(i))
      i += 1
    }
    buf.array()
  }

  /** Decode one StoredRecord starting at `pos` (at the record_len prefix).
    * Returns (record, nextPos). Throws on malformed input — the streaming
    * source catches this to stop at a torn tail write (the reference's
    * recovery replay stops on first parse failure, segment.rs:213-231). */
  def decodeRecordAt(bytes: Array[Byte], pos: Int): (InternalRow, Int) = {
    val buf = ByteBuffer.wrap(bytes, pos, bytes.length - pos)
    val recordLen = buf.getInt
    // 28 = 8 offset + 8 ts + 3×4 mandatory length fields (a 24..27 value
    // would mis-frame into the next record); every inner length must also
    // fit — bounded by THIS record's own end, not the whole buffer, so a
    // corrupt record can never consume the following records' bytes and
    // silently mis-frame (and never NegativeArraySizeException / multi-GB
    // allocate on garbage lengths).
    require(recordLen >= 28 && recordLen <= buf.remaining(),
      s"bad record_len $recordLen at $pos")
    val recordEnd = buf.position() + recordLen
    def checkedBytes(len: Int, what: String): Array[Byte] = {
      // long math: position + a near-Int.MaxValue corrupt length would
      // wrap negative and sail past the bound
      require(len >= 0 && buf.position().toLong + len <= recordEnd,
        s"bad $what length $len at $pos")
      val a = new Array[Byte](len); buf.get(a); a
    }
    val offset = buf.getLong
    val ts = buf.getLong
    val klen = buf.getInt
    val key = if (klen == 0) null else checkedBytes(klen, "key")
    val value = checkedBytes(buf.getInt, "value")
    val hn = buf.getInt
    require(hn >= 0 && buf.position() + hn.toLong * 8 <= recordEnd,
      s"bad header_count $hn at $pos")
    val headers = if (hn == 0) null else {
      val rows = new Array[Any](hn)
      var i = 0
      while (i < hn) {
        val kb = checkedBytes(buf.getInt, "header key")
        val vb = checkedBytes(buf.getInt, "header value")
        rows(i) = InternalRow(UTF8String.fromBytes(kb), vb)
        i += 1
      }
      new GenericArrayData(rows)
    }
    (InternalRow(offset, ts, key, value, headers), pos + 4 + recordLen)
  }

  // ---- expressions ----

  /** flyq_encode_record(offset, ts_ms, key, value, headers) -> binary */
  case class FlyqEncodeRecord(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 5)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val off = children(0).eval(input).asInstanceOf[java.lang.Long]
      val ts = children(1).eval(input).asInstanceOf[java.lang.Long]
      val key = children(2).eval(input).asInstanceOf[Array[Byte]]
      val value = children(3).eval(input).asInstanceOf[Array[Byte]]
      val headers = children(4).eval(input).asInstanceOf[ArrayData]
      encodeRecord(if (off == null) 0L else off.longValue(), key, value,
        if (ts == null) 0L else ts.longValue(), headers)
    }
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(children = c)
  }

  /** flyq_decode_record(binary) -> record struct */
  case class FlyqDecodeRecord(child: Expression)
      extends UnaryExpression with KernelCodegenUnary {
    override def dataType: DataType = recordType
    override protected def nullSafeEval(bytes: Any): Any =
      decodeRecordAt(bytes.asInstanceOf[Array[Byte]], 0)._1
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** flyq_decode_segment(binary) -> array<record struct>: decode a whole
    * segment file's concatenated records; stops cleanly at a torn tail. */
  case class FlyqDecodeSegment(child: Expression)
      extends UnaryExpression with KernelCodegenUnary {
    override def dataType: DataType = ArrayType(recordType, containsNull = false)
    override protected def nullSafeEval(b: Any): Any = {
      val bytes = b.asInstanceOf[Array[Byte]]
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var pos = 0
      var ok = true
      while (ok && pos + 4 <= bytes.length) {
        try {
          val (row, next) = decodeRecordAt(bytes, pos)
          out += row
          pos = next
        } catch { case _: IllegalArgumentException |
                       _: java.nio.BufferUnderflowException => ok = false }
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  // ---- Column-level API ----
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def flyq_encode_record(offset: Column, tsMs: Column, key: Column,
                         value: Column, headers: Column): Column =
    column(FlyqEncodeRecord(Seq(offset, tsMs, key, value, headers)
      .map(expression)))

  def flyq_decode_record(bytes: Column): Column =
    column(FlyqDecodeRecord(expression(bytes)))

  def flyq_decode_segment(bytes: Column): Column =
    column(FlyqDecodeSegment(expression(bytes)))
}
