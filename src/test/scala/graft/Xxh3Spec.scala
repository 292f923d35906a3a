package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Xxh3

/** Golden-vector verification of the independent XXH3-64 implementation.
  *
  * Expected values were produced by the reference C implementation
  * (xxHash 0.8.2, the copy vendored by pyarrow) over a deterministic
  * LCG-filled buffer regenerated identically here — the same oracle the
  * reference broker's `xxhash_rust` crate conforms to (XXH3 is frozen
  * since 0.8.0). Lengths are chosen to cross every internal boundary:
  * 0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / striped long path with 1,
  * 2 and 4+ blocks (block = 1024 B).
  */
class Xxh3Spec extends AnyFunSuite {

  /** Same generator as the C side: u32 LCG, take the top byte. */
  private def lcgBuf(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var x = 2654435761L.toInt
    var i = 0
    while (i < n) { x = x * 1664525 + 1013904223; b(i) = (x >>> 24).toByte; i += 1 }
    b
  }

  private val vectors: Seq[(Int, Long)] = Seq(
    0 -> 0x2d06800538d394c2L, 1 -> 0x74d3766ca02423f3L,
    2 -> 0x52a4e47d9348fa36L, 3 -> 0x9e77e470a7018920L,
    4 -> 0x093645744145d7e3L, 5 -> 0x8030fd917e4cbf5aL,
    7 -> 0x88a1647440a9b56cL, 8 -> 0x854c59bc83f9a7b7L,
    9 -> 0xfb2102f80bd05046L, 12 -> 0x144939e7611fe0a5L,
    16 -> 0x294d5381d3d9f990L, 17 -> 0x79770199644b19d3L,
    24 -> 0x62592914d77e2827L, 32 -> 0x01adb610690b30e5L,
    33 -> 0x47485c2c29c37a79L, 48 -> 0x14a195e735c6e356L,
    64 -> 0xe64d3d0ef69415a8L, 65 -> 0xfa0c3fffe196c471L,
    96 -> 0xbd031f5852866924L, 97 -> 0x26be75dcd91851cbL,
    128 -> 0x7a255dc3181c5edeL, 129 -> 0x074f486ff94b8e7dL,
    160 -> 0x569a0e9dbf9f0febL, 192 -> 0x1f138d1350d6a482L,
    240 -> 0x414bbb0678ea02e0L, 241 -> 0xef60a4fc8b25f1ccL,
    256 -> 0xddf43fdda4785f38L, 384 -> 0x1b57686d8a5a28c3L,
    511 -> 0x7cdb8118cd14fdd9L, 512 -> 0xb68df51d0f0b428bL,
    1023 -> 0x78d83b4028b26105L, 1024 -> 0x53de00d98ba8bad5L,
    1025 -> 0xde126c62f3f1d23eL, 2048 -> 0x317d259e9c5489f8L,
    4096 -> 0xacf8c0a7adc95ae3L)

  private val keyVectors: Seq[(String, Long)] = Seq(
    "" -> 0x2d06800538d394c2L,
    "a" -> 0xe6c632b61e964e1fL,
    "ab" -> 0xa873719c24d5735cL,
    "abc" -> 0x78af5f94892f3950L,
    "user-42" -> 0x50fe4b21cf7b09cdL,
    "orders" -> 0xa88ccdc9fa4974fbL,
    "the quick brown fox jumps over the lazy dog" -> 0xe4541a9cacf545aaL,
    "0123456789abcdef0123456789abcdef" -> 0x01121d5b6c0ac055L)

  test("every length-class golden vector matches the reference C implementation") {
    val buf = lcgBuf(4096)
    vectors.foreach { case (len, expect) =>
      val got = Xxh3.hash64(java.util.Arrays.copyOf(buf, len))
      assert(got === expect,
        f"len=$len: got 0x$got%016x expected 0x$expect%016x")
    }
  }

  test("ASCII key vectors (the partitioner input shape) match") {
    keyVectors.foreach { case (k, expect) =>
      val got = Xxh3.hash64(k.getBytes("UTF-8"))
      assert(got === expect, f"key '$k': got 0x$got%016x")
    }
  }

  test("partitionOf = the reference's (hash as u32) % n rule, golden-pinned") {
    // The reference truncates to u32 BEFORE the mod
    // (`topic.rs:90-93`: `(xxh3_64(key) as u32) % partition_count`).
    // Expected partitions below are hand-derived from the golden hash
    // constants (reference-C verified, keyVectors above) by applying
    // `(h & 0xffffffff) % n` on paper — NOT by calling partitionOf, so a
    // perturbed production rule fails here (r10 verdict item 2).
    //   "abc"     h=0x78af5f94892f3950, low32=0x892f3950=2301573456
    //   "user-42" h=0x50fe4b21cf7b09cd, low32=0xcf7b09cd=3480947149
    //   "orders"  h=0xa88ccdc9fa4974fbL, low32=0xfa4974fb=4199118075
    val golden = Seq(
      // (key, n, expected u32-rule partition, the WRONG full-u64 answer)
      ("abc", 3L, 0L, 1L),      // 2301573456 % 3 = 0; u64 rule says 1
      ("abc", 6L, 0L, 4L),      // 2301573456 % 6 = 0; u64 rule says 4
      ("abc", 7L, 0L, 2L),      // 2301573456 % 7 = 0; u64 rule says 2
      ("user-42", 7L, 1L, 3L),  // 3480947149 % 7 = 1; u64 rule says 3
      ("orders", 7L, 5L, 1L),   // 4199118075 % 7 = 5; u64 rule says 1
      ("orders", 10L, 5L, 9L))  // 4199118075 % 10 = 5; u64 rule says 9
    golden.foreach { case (k, n, expect, u64Wrong) =>
      val got = Xxh3.partitionOf(k.getBytes("UTF-8"), n)
      assert(got === expect, s"key '$k' n=$n")
      // each case PROVABLY separates the two rules — a full-u64
      // remainder (the pre-r11 bug) lands on a different partition
      assert(java.lang.Long.remainderUnsigned(
        Xxh3.hash64(k.getBytes("UTF-8")), n) === u64Wrong, s"separating case $k/$n")
      assert(expect !== u64Wrong)
    }
    // power-of-two counts: the two rules coincide (low bits == full mod)
    keyVectors.foreach { case (k, h) =>
      assert(Xxh3.partitionOf(k.getBytes("UTF-8"), 4L) === ((h & 0xffffffffL) % 4L))
      assert(((h & 0xffffffffL) % 4L) === java.lang.Long.remainderUnsigned(h, 4L))
    }
  }

  test("key_partitioner_xxh3: total routing, partitions match the reference rule") {
    val spark = Testing.spark
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.BrokerOps.keyPartitionerXxh3(spark, sf).collect()
    val n = graft.model.LogModel.NumPartitions
    assert(rows.map(_.getAs[Long]("part_id")).forall(p => p >= 0 && p < n))
    assert(rows.map(_.getAs[Long]("n_records")).sum ===
      graft.sources.Tables.load(spark, sf, "events").count())
    // spot-check the routing rule against the scalar reference form
    val uid = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id").head().getLong(0)
    // the power-of-two bitmask the query uses IS the unsigned remainder
    val h = Xxh3.hash64(uid.toString.getBytes("UTF-8"))
    assert((h & (n - 1)) === Xxh3.partitionOf(uid.toString.getBytes("UTF-8"), n.toLong))
  }

  test("the DuckDB oracle twin embeds the kernel's exact fold constants") {
    // the SQL itself is validated against this kernel on 100k keys by
    // the driver's DuckDB gate; THIS guard catches the silent failure
    // mode — an edit to either side's constants that would only surface
    // at driver time. Constants are read from Xxh3 (single source).
    val sql = graft.OracleSql.xxh3PartitionerSql
    def u(l: Long) = java.lang.Long.toUnsignedString(l)
    Seq(Xxh3.secretXor32, Xxh3.secretXor8_16, Xxh3.secretXor24_32,
      Xxh3.secretXor40_48).foreach(c => assert(sql.contains(u(c)), u(c)))
    // wrap-mul limb constants of the three primes the chain multiplies by
    Seq(Xxh3.Prime64_2, Xxh3.Prime64_3, Xxh3.PrimeMx1, Xxh3.PrimeMx2)
      .foreach { p =>
        assert(sql.contains(u(p >>> 32)), s"high limb of ${u(p)}")
        assert(sql.contains(u(p & 0xffffffffL)), s"low limb of ${u(p)}")
      }
    // the truncate-to-u32-then-mod routing rule, verbatim
    assert(sql.contains("(h % 4294967296) %"))
    // length classes all present; >16 falls through to NULL (loud fail)
    Seq("WHEN l <= 3", "WHEN l <= 8", "WHEN l <= 16").foreach(c =>
      assert(sql.contains(c), c))
  }

  test("the Catalyst expression matches the static function, interpreted and codegen") {
    val spark = Testing.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = keyVectors.map(_._1)
    val got = keys.toDF("k")
      .select(col("k"), Xxh3.xxh3_64(encode(col("k"), "UTF-8")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keyVectors.foreach { case (k, expect) => assert(got(k) === expect, k) }
  }
}
