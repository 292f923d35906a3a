package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** XXH3-64 (seedless), independently implemented from the public xxHash
  * specification (Y. Collet, BSD-2; algorithm v0.8.x — frozen stable since
  * 0.8.0), for answer-level parity with the reference's key partitioner
  * (`flyq-server/src/core/topic.rs:91` hashes the message key with
  * `xxhash_rust::xxh3::xxh3_64` and takes the remainder by the partition
  * count). The 192-byte default secret and the prime constants are the
  * spec-mandated interop values; everything else is written fresh in
  * Scala. Golden vectors in Xxh3Spec were generated against the reference
  * C implementation (the copy vendored by pyarrow, version 0.8.2).
  *
  * All four input classes are covered — 0-16 B (the partitioner's real
  * key shape), 17-128 B, 129-240 B, and the striped long-input path — so
  * the expression is a general-purpose hash, not a short-key special
  * case. Arithmetic is on signed Long with wrapping semantics, which
  * matches u64 mod 2^64 exactly; the only places signedness matters
  * (the 128-bit multiply high half, the final remainder) use explicit
  * unsigned forms.
  */
object Xxh3 {

  private val P32_1 = 0x9E3779B1L
  private val P32_2 = 0x85EBCA77L
  private val P32_3 = 0xC2B2AE3DL
  private val P64_1 = 0x9E3779B185EBCA87L
  private val P64_2 = 0xC2B2AE3D27D4EB4FL
  private val P64_3 = 0x165667B19E3779F9L
  private val P64_4 = 0x85EBCA77C2B2AE63L
  private val P64_5 = 0x27D4EB2F165667C5L
  private val MX1 = 0x165667919E3779F9L
  private val MX2 = 0x9FB21C651E98DF25L

  /** The spec's 192-byte default secret (kSecret) — an interop constant,
    * identical in every conforming implementation. */
  private val Secret: Array[Byte] = (
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f" +
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c" +
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8" +
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364" +
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e" +
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e")
    .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  require(Secret.length == 192)

  @inline private def readLE64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readLE32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  /** Unsigned 128-bit multiply, high 64 bits (Java 17 has only the signed
    * Math.multiplyHigh; the unsigned correction adds back the two
    * sign-extension terms). */
  @inline private def uMulHigh(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  @inline private def fold64(a: Long, b: Long): Long =
    (a * b) ^ uMulHigh(a, b)

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37; h *= MX1; h ^= h >>> 32
    h
  }

  @inline private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P64_2; h ^= h >>> 29; h *= P64_3; h ^= h >>> 32
    h
  }

  @inline private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= java.lang.Long.rotateLeft(h, 49) ^ java.lang.Long.rotateLeft(h, 24)
    h *= MX2
    h ^= (h >>> 35) + len
    h *= MX2
    h ^ (h >>> 28)
  }

  @inline private def mix16(in: Array[Byte], i: Int, s: Int): Long =
    fold64(readLE64(in, i) ^ readLE64(Secret, s),
      readLE64(in, i + 8) ^ readLE64(Secret, s + 8))

  /** Secret-derived fold constants for the short-input paths, exposed so
    * the DuckDB oracle twin (OracleSql.xxh3 CTE generator) shares the
    * exact interop values instead of duplicating the secret hex. */
  private[graft] def secretXor32: Long = readLE32(Secret, 0) ^ readLE32(Secret, 4)
  private[graft] def secretXor8_16: Long = readLE64(Secret, 8) ^ readLE64(Secret, 16)
  private[graft] def secretXor24_32: Long = readLE64(Secret, 24) ^ readLE64(Secret, 32)
  private[graft] def secretXor40_48: Long = readLE64(Secret, 40) ^ readLE64(Secret, 48)
  private[graft] val PrimeMx1: Long = MX1
  private[graft] val PrimeMx2: Long = MX2
  private[graft] val Prime64_2: Long = P64_2
  private[graft] val Prime64_3: Long = P64_3

  def hash64(in: Array[Byte]): Long = {
    val len = in.length
    if (len <= 16) {
      if (len > 8) {
        val lo = readLE64(in, 0) ^
          (readLE64(Secret, 24) ^ readLE64(Secret, 32))
        val hi = readLE64(in, len - 8) ^
          (readLE64(Secret, 40) ^ readLE64(Secret, 48))
        avalanche(len + java.lang.Long.reverseBytes(lo) + hi + fold64(lo, hi))
      } else if (len >= 4) {
        val in64 = readLE32(in, len - 4) + (readLE32(in, 0) << 32)
        rrmxmx(in64 ^ (readLE64(Secret, 8) ^ readLE64(Secret, 16)), len)
      } else if (len > 0) {
        val combined = ((in(0) & 0xffL) << 16) | ((in(len >> 1) & 0xffL) << 24) |
          (in(len - 1) & 0xffL) | (len.toLong << 8)
        avalanche64(combined ^ (readLE32(Secret, 0) ^ readLE32(Secret, 4)))
      } else
        avalanche64(readLE64(Secret, 56) ^ readLE64(Secret, 64))
    } else if (len <= 128) {
      var acc = len * P64_1
      if (len > 32) {
        if (len > 64) {
          if (len > 96) {
            acc += mix16(in, 48, 96); acc += mix16(in, len - 64, 112)
          }
          acc += mix16(in, 32, 64); acc += mix16(in, len - 48, 80)
        }
        acc += mix16(in, 16, 32); acc += mix16(in, len - 32, 48)
      }
      acc += mix16(in, 0, 0); acc += mix16(in, len - 16, 16)
      avalanche(acc)
    } else if (len <= 240) {
      var acc = len * P64_1
      var i = 0
      while (i < 8) { acc += mix16(in, 16 * i, 16 * i); i += 1 }
      acc = avalanche(acc)
      // trailing 16B chunks reuse the secret from offset 3; the final
      // chunk reads the secret at 136 - 17 (spec's MIDSIZE offsets)
      var accEnd = mix16(in, len - 16, 136 - 17)
      val nbRounds = len / 16
      i = 8
      while (i < nbRounds) { accEnd += mix16(in, 16 * i, 16 * (i - 8) + 3); i += 1 }
      avalanche(acc + accEnd)
    } else hashLong(in, len)
  }

  /** Striped bulk path (> 240 B): 64-byte stripes accumulated into 8
    * lanes, secret advancing 8 bytes per stripe; a scramble every
    * 16-stripe block; the spec's off-alignment secret offsets for the
    * last stripe (end-71) and the merge (11). */
  private def hashLong(in: Array[Byte], len: Int): Long = {
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)

    def accumulate512(off: Int, secOff: Int): Unit = {
      var i = 0
      while (i < 8) {
        val dv = readLE64(in, off + 8 * i)
        val dk = dv ^ readLE64(Secret, secOff + 8 * i)
        acc(i ^ 1) += dv
        acc(i) += (dk & 0xffffffffL) * (dk >>> 32)
        i += 1
      }
    }

    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock  // 1024
    val nbBlocks = (len - 1) / blockLen
    var n = 0
    while (n < nbBlocks) {
      var s = 0
      while (s < nbStripesPerBlock) { accumulate512(n * blockLen + 64 * s, 8 * s); s += 1 }
      // scramble with the last 64 secret bytes
      var i = 0
      while (i < 8) {
        var a = acc(i)
        a ^= a >>> 47
        a ^= readLE64(Secret, 192 - 64 + 8 * i)
        acc(i) = a * P32_1
        i += 1
      }
      n += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) { accumulate512(nbBlocks * blockLen + 64 * s, 8 * s); s += 1 }
    accumulate512(len - 64, 192 - 64 - 7) // last stripe

    var result = len * P64_1
    var i = 0
    while (i < 4) {
      result += fold64(acc(2 * i) ^ readLE64(Secret, 11 + 16 * i),
        acc(2 * i + 1) ^ readLE64(Secret, 11 + 16 * i + 8))
      i += 1
    }
    avalanche(result)
  }

  /** Reference partition routing (`topic.rs:90-93`):
    * `(xxh3_64(key) as u32) % partition_count` — the hash is truncated to
    * its LOW 32 BITS first, then reduced modulo the (u32) partition count.
    * The truncation matters: a full-u64 remainder agrees with this rule
    * only when n is a power of two (low bits ≡ full mod); for composite
    * counts (3, 6, 7, 10 …) the placements diverge. The masked value is
    * non-negative and < 2^32, so plain signed `%` is exact here. */
  def partitionOf(key: Array[Byte], n: Long): Long =
    (hash64(key) & 0xffffffffL) % n

  /** xxh3_64(binary) -> long Catalyst expression. Codegen emits one
    * static call per row — stays inside WholeStageCodegen like the
    * built-in XxHash64 (which is XXH64, a different algorithm — hence
    * this expression). */
  case class Xxh3_64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"xxh3_64 requires binary input, got ${child.dataType}")
    }
    override protected def nullSafeEval(bytes: Any): Any =
      hash64(bytes.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Xxh3.hash64($c)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: XXH3-64 of a binary column (signed long carrying the u64
    * bit pattern). */
  def xxh3_64(c: Column): Column = Bridge.column(Xxh3_64(Bridge.expression(c)))

  /** xxh3_partition(binary, n) -> long: [[partitionOf]] as a Catalyst
    * expression — the reference's `(xxh3_64(key) as u32) % n` rule
    * (`topic.rs:90-93`: truncate to u32 FIRST, then mod), valid for ANY
    * partition count. Neither `pmod` nor an unsigned full-u64 remainder
    * on the signed carrier matches this off power-of-two counts. Used by
    * the bulk produce path and pinned to the socket server's routing by
    * SocketLifecycleSpec. */
  case class Xxh3Partition(child: Expression, n: Long)
      extends UnaryExpression {
    require(n > 0, s"partition count must be positive, got $n")
    override def dataType: DataType = LongType
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"xxh3_partition requires binary input, got ${child.dataType}")
    }
    override protected def nullSafeEval(bytes: Any): Any =
      partitionOf(bytes.asInstanceOf[Array[Byte]], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Xxh3.partitionOf($c, ${n}L)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def xxh3_partition(c: Column, n: Long): Column =
    Bridge.column(Xxh3Partition(Bridge.expression(c), n))
}
