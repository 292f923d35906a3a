package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.{FlyqClient, FlyqServer}
import graft.protocol.Payloads.WireMessage
import graft.sources.{Broker, SegmentFiles}

/** The whole broker family at a COMPOSITE (non-power-of-two) partition
  * count — r10 verdict item 6: every prior spec and bench used n = 4
  * (or 2), which is exactly why the full-u64-remainder routing bug was
  * invisible (the u32-truncate rule and the u64 rule coincide on
  * power-of-two counts). n = 6 separates them.
  *
  * Every expectation here is ENGINE SEMANTICS computed independently of
  * the operators under test: routing from the raw golden-pinned hash with
  * the reference rule `(xxh3_64(key) as u32) % n` (`topic.rs:90-93`)
  * applied inline, consume/lag/compaction from plain-Scala folds over the
  * collected record set.
  */
class CompositePartitionsSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  private val N = 6

  /** Reference routing rule, inline (NOT Xxh3.partitionOf). */
  private def refRoute(key: Array[Byte]): Long =
    (graft.functions.Xxh3.hash64(key) & 0xffffffffL) % N

  private lazy val produced: String = {
    val dir = Files.createTempDirectory("flyq-composite").toString
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(
        when($"event_id" % 10 === 0, lit(null))
          .otherwise($"user_id".cast("string").cast("binary")).as("mkey"),
        $"props".cast("binary").as("mvalue"),
        unix_millis($"ts").as("ts_ms"),
        $"event_id")
    Broker.produce(ev, dir, "events", orderCols = Seq("ts_ms", "event_id"),
      numPartitions = N) // default 4 KiB segments force rotation
    dir
  }

  private lazy val back = {
    val b = SegmentFiles.readTopic(spark, produced, "events").cache()
    b.count()
    b
  }

  test("key_partitioner_xxh3_n6's data separates u32-truncate from u64 mod") {
    // r12: the oracle gate on the n=6 routing row only has power if the
    // driver's testdata contains keys whose placements DIFFER between
    // the reference rule ((hash as u32) % 6) and a full-u64 remainder —
    // if a data refresh ever produced a key set where the rules
    // coincide, the gate would go silently toothless. Pinned on both
    // oracle SF dirs. (The rule itself is pinned against reference-C
    // golden vectors in Xxh3Spec; this asserts the GATE's separating
    // power on the actual data.)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val keys = graft.sources.Tables.load(spark, sf, "events")
        .select($"user_id").distinct().as[Long].collect()
      val separating = keys.count { u =>
        val h = graft.functions.Xxh3.hash64(
          u.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (h & 0xffffffffL) % N != java.lang.Long.remainderUnsigned(h, N)
      }
      assert(separating > 0,
        s"$sf: no key separates the two routing rules at n=$N — " +
          "the key_partitioner_xxh3_n6 oracle gate has no power here")
      info(s"$sf: $separating/${keys.length} keys separate the rules")
    }
  }

  test("produce at n=6: keyed placement follows (hash as u32) % 6 exactly") {
    val keyed = back.filter($"mkey".isNotNull)
      .select($"part_id", $"mkey").collect()
    assert(keyed.nonEmpty)
    // at least one key must separate the u32 rule from the u64 rule,
    // otherwise this run proves nothing the n=4 specs didn't
    var separated = false
    keyed.foreach { r =>
      val k = r.getAs[Array[Byte]](1)
      val h = graft.functions.Xxh3.hash64(k)
      val expect = (h & 0xffffffffL) % N
      assert(r.getLong(0) === expect,
        s"key ${new String(k)} on ${r.getLong(0)}, reference places $expect")
      if (expect != java.lang.Long.remainderUnsigned(h, N)) separated = true
    }
    assert(separated,
      "no key separated the u32-truncate rule from the full-u64 rule")
  }

  test("produce at n=6: keyless round-robin cycles all 6, offsets dense") {
    // keyless counts within 1 of each other across all 6 partitions
    val klCounts = back.filter($"mkey".isNull)
      .groupBy("part_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(klCounts.keySet === (0L until N.toLong).toSet)
    assert(klCounts.values.max - klCounts.values.min <= 1)
    // offsets dense 0..cnt-1 per partition
    val bad = back.groupBy("part_id").agg(
      min("msg_offset").as("mn"), max("msg_offset").as("mx"),
      count(lit(1)).as("cnt"), countDistinct("msg_offset").as("nd"))
      .filter($"mn" =!= 0 || $"mx" =!= $"cnt" - 1 || $"nd" =!= $"cnt")
    assert(bad.count() === 0)
    // segment rotation happened at the small segMaxBytes
    assert(back.select("part_id", "base_off").distinct()
      .groupBy("part_id").count().filter($"count" > 1).count() > 0)
  }

  test("consume-from-offset on the n=6 materialized topic (R1/R6 semantics)") {
    val k = 5L
    // production plan shape (min_by aggregate) over the materialized log
    val got = back.filter($"msg_offset" >= k)
      .groupBy("part_id")
      .agg(min_by(struct($"msg_offset", $"mvalue"), $"msg_offset").as("r"))
      .select($"part_id", $"r.msg_offset".as("msg_offset"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // engine semantics, plain Scala: first offset >= k per partition
    val expect = back.select("part_id", "msg_offset").collect()
      .groupBy(_.getLong(0))
      .flatMap { case (p, rs) =>
        rs.map(_.getLong(1)).filter(_ >= k).sorted.headOption.map(p -> _)
      }
    assert(got === expect)
  }

  test("consumer lag + watermarks on the n=6 materialized topic (O1/O2)") {
    import graft.model.LogModel
    val wm = LogModel.watermarks(back)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // engine semantics: low = min offset, high = max, log_end = max + 1
    val perPart = back.select("part_id", "msg_offset").collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        val offs = rs.map(_.getLong(1)); p -> (offs.min, offs.max, offs.max + 1)
      }
    assert(wm === perPart)
    assert(wm.keySet === (0L until N.toLong).toSet)
    // the PRODUCTION lag operator over the materialized composite-n log
    val lag = graft.operators.BrokerOps.consumerLagFrom(back)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    perPart.foreach { case (p, (_, high, _)) =>
      val anCommitted = high / 2 // floor(high/2), "analytics" half-caught-up
      assert(lag(("analytics", p)) === ((anCommitted, high, high - anCommitted)))
      assert(lag(("billing", p)) === ((high, high, 0L)))
    }
  }

  test("compaction decision on the n=6 materialized topic (M5 semantics)") {
    // production aggregation shape: per (part_id, mkey) the max offset wins
    val got = back.filter($"mkey".isNotNull)
      .groupBy($"part_id", $"mkey".cast("string").as("k"))
      .agg(max("msg_offset").as("last_off"), count(lit(1)).as("n_versions"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val expect = back.filter($"mkey".isNotNull)
      .select($"part_id", $"mkey".cast("string"), $"msg_offset").collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (key, rs) =>
        key -> (rs.map(_.getLong(2)).max, rs.size.toLong) }
    assert(got === expect)
    // routing invariant the compactor relies on: a key lives in ONE partition
    val split = expect.keySet.groupBy(_._2).filter(_._2.map(_._1).size > 1)
    assert(split.isEmpty, s"keys split across partitions: ${split.keys.take(3)}")
  }

  test("v2 streaming source reads the n=6 topic completely, offsets intact") {
    import org.apache.spark.sql.functions._
    val ckpt = Files.createTempDirectory("flyq-composite-ckpt").toString
    val q = spark.readStream
      .format("graft.sources.v2.FlyqSegmentSource")
      .option("topic", "events").load(produced)
      .writeStream.format("memory").queryName("composite_tail")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("composite_tail")
      assert(got.count() === back.count())
      assert(got.select("part_id").distinct().count() === N.toLong)
      // per-partition offset sets identical to the batch read
      val bad = got.groupBy("part_id")
        .agg(max("msg_offset").as("mx"), count(lit(1)).as("cnt"),
          countDistinct("msg_offset").as("nd"))
        .filter($"mx" =!= $"cnt" - 1 || $"nd" =!= $"cnt")
      assert(bad.count() === 0)
    } finally q.stop()
  }

  test("socket server at n=6: ack placement = reference rule, consume round-trips") {
    val dir = Files.createTempDirectory("flyq-sock-composite").toString
    val server = new FlyqServer(dir, numPartitions = N)
    val c = new FlyqClient("127.0.0.1", server.start())
    try {
      val keys = (0 until 24).map(i => s"user-$i")
      val acks = keys.map { k =>
        val kb = k.getBytes("UTF-8")
        val ack = c.produce("comp",
          WireMessage(1000L, Some(kb), s"v-$k".getBytes("UTF-8"), Nil))
        assert(ack.isRight, s"produce $k: $ack")
        k -> ack.toOption.get
      }
      var separated = false
      acks.foreach { case (k, ack) =>
        val kb = k.getBytes("UTF-8")
        assert(ack.partition === refRoute(kb), s"key $k")
        if (refRoute(kb) !=
          java.lang.Long.remainderUnsigned(graft.functions.Xxh3.hash64(kb), N))
          separated = true
        // and the record is readable back from exactly that partition
        val got = c.consume("comp", ack.partition, ack.offset)
        assert(got.isRight)
        assert(new String(got.toOption.get.message.value, "UTF-8") === s"v-$k")
      }
      assert(separated,
        "no key separated the u32-truncate rule from the full-u64 rule")
    } finally { c.close(); server.stop() }
  }
}
