package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.LogModel
import graft.operators.BrokerOps

/** Mirrors the reference's integration tests (FIXTURES.md §B):
  * watermark triple (flyq-server/tests/watermark_apis.rs:9-42), lag math
  * (:44-93), group semantics (tests/offset_tracker.rs), offset density
  * (partition.rs append tests). */
class LogModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** N synthetic single-user events → all land in one partition, offsets
    * assigned in ts order (the reference's "produce N messages" fixture). */
  private def produce(n: Int): DataFrame = {
    val df = (0 until n).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d.${i / 60}%03d"),
        7L, "click", 1.0, s"p$i")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    LogModel.toLog(df)
  }

  test("watermark triple after 10 produces: low=0 high=9 log_end=10") {
    val wm = LogModel.watermarks(produce(10)).collect()
    assert(wm.length === 1)
    val r = wm.head
    assert(r.getAs[Long]("low_off") === 0L)
    assert(r.getAs[Long]("high_off") === 9L)
    assert(r.getAs[Long]("log_end_off") === 10L)
  }

  test("offsets are dense 0..n-1 per partition and deterministic") {
    val log = LogModel.toLog(LogModel.events(spark, sf))
    val bad = log.groupBy("part_id").agg(
        min("msg_offset").as("mn"), max("msg_offset").as("mx"),
        count(lit(1)).as("n"), countDistinct("msg_offset").as("nd"))
      .filter($"mn" =!= 0 || $"mx" =!= $"n" - 1 || $"nd" =!= $"n")
    assert(bad.count() === 0)
  }

  test("same key always hashes to the same partition") {
    val log = LogModel.toLog(LogModel.events(spark, sf))
    val multi = log.groupBy("user_id")
      .agg(countDistinct("part_id").as("np")).filter($"np" > 1)
    assert(multi.count() === 0)
  }

  test("lag math: 20 produces, commit 10 -> lag 9; commit 19 -> lag 0") {
    // reference tests/watermark_apis.rs:44-93 (lag = hwm - committed)
    val wm = LogModel.watermarks(produce(20))
    def lagFor(committed: Long): Long =
      wm.select(greatest($"high_off" - lit(committed), lit(0L))).as[Long].head()
    assert(lagFor(10L) === 9L)
    assert(lagFor(19L) === 0L)
    assert(lagFor(25L) === 0L) // saturating_sub, log_engine.rs:209
  }

  test("commit upsert is last-write-wins per (group, partition)") {
    val merged = BrokerOps.commitOffsetState(spark, sf).collect()
    val wm = LogModel.watermarks(LogModel.toLog(LogModel.events(spark, sf)))
      .collect().map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("high_off")).toMap
    merged.filter(_.getAs[String]("grp") == "analytics").foreach { r =>
      val p = r.getAs[Long]("part_id")
      val expected = if (p % 2 == 0) wm(p) else wm(p) / 2
      assert(r.getAs[Long]("committed") === expected, s"partition $p")
    }
    // billing untouched by the new batch
    merged.filter(_.getAs[String]("grp") == "billing").foreach { r =>
      assert(r.getAs[Long]("committed") === wm(r.getAs[Long]("part_id")))
    }
  }

  test("multi-topic lag: all-topics default, topic filter, skip-unknown, shared committed state") {
    val all = BrokerOps.consumerLagMultiTopic(spark, sf).collect()
    // every (grp, topic, part) cell present; topics are the three routes
    assert(all.map(_.getAs[String]("topic")).toSet ===
      Set("activity", "clicks", "purchases"))
    // committed offsets are topic-AGNOSTIC (offset_tracker.rs:6-10): one
    // value per (grp, part), equal across topics, and equal to the
    // single-topic model's committed state (same partitioner, global high)
    val single = BrokerOps.consumerLag(spark, sf).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("part_id")) ->
        r.getAs[Long]("committed")).toMap
    all.foreach { r =>
      val k = (r.getAs[String]("grp"), r.getAs[Long]("part_id"))
      assert(r.getAs[Long]("committed") === single(k), s"$k")
      // saturating lag
      assert(r.getAs[Long]("lag") ===
        math.max(r.getAs[Long]("high_off") - r.getAs[Long]("committed"), 0L))
    }
    // per-group rollup sums the SELECTED rows
    all.groupBy(_.getAs[String]("grp")).foreach { case (g, rows) =>
      assert(rows.map(_.getAs[Long]("total_lag")).toSet ===
        Set(rows.map(_.getAs[Long]("lag")).sum), s"group $g")
    }
    // Some(list): only named topics, unknown names silently skipped
    // (log_engine.rs:199-201), rollup recomputed over the selection
    val filtered = BrokerOps.consumerLagMultiTopic(
      spark, sf, Some(BrokerOps.TopicFilterExample)).collect()
    assert(filtered.map(_.getAs[String]("topic")).toSet ===
      Set("clicks", "purchases"))
    val allKeyed = all.map(r => (r.getAs[String]("grp"),
      r.getAs[String]("topic"), r.getAs[Long]("part_id")) ->
      (r.getAs[Long]("committed"), r.getAs[Long]("high_off"),
        r.getAs[Long]("lag"))).toMap
    filtered.groupBy(_.getAs[String]("grp")).foreach { case (g, rows) =>
      rows.foreach { r =>
        val k = (g, r.getAs[String]("topic"), r.getAs[Long]("part_id"))
        assert(allKeyed(k) === ((r.getAs[Long]("committed"),
          r.getAs[Long]("high_off"), r.getAs[Long]("lag"))), s"$k")
      }
      assert(rows.map(_.getAs[Long]("total_lag")).toSet ===
        Set(rows.map(_.getAs[Long]("lag")).sum), s"group $g filtered")
    }
  }

  test("consume_with_group returns the record at the committed offset") {
    val rows = BrokerOps.consumeWithGroup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("msg_offset") === r.getAs[Long]("committed"))
    }
  }

  test("segment assignment: bytes per segment bounded, offsets contiguous") {
    val segs = BrokerOps.segmentAssignment(spark, sf)
      .orderBy("part_id", "segment_id").collect()
    segs.groupBy(_.getAs[Long]("part_id")).foreach { case (_, ss) =>
      // base of segment k+1 = last of segment k + 1 (no gaps)
      ss.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("base_off") === a.getAs[Long]("last_off") + 1)
        case _ =>
      }
    }
    // every segment except possibly one-record ones stays near the cap:
    // floor-based assignment means seg_bytes <= cap + max_record_size
    val maxRec = 32 + 2 + 16
    segs.foreach { r =>
      assert(r.getAs[Long]("seg_bytes") <= LogModel.SegmentMaxBytes + maxRec)
    }
  }

  test("retention keeps the active segment even when all data is stale") {
    val ret = BrokerOps.retentionFilter(spark, sf).collect()
    assert(ret.nonEmpty)
    ret.foreach(r => assert(r.getAs[Long]("retained_segments") >= 1))
  }

  test("portableHash matches exact BigInt arithmetic at overflow boundaries") {
    // round-1 advice: the naive k*2654435761 % 2^32 wraps Int64 in Spark for
    // k ≳ 3.47e9 while DuckDB raises; the limb-split form must equal the
    // mathematically exact masked hash everywhere, including negatives.
    val keys = Seq(0L, 1L, 7L, 65535L, 65536L, Int.MaxValue.toLong,
      4294967295L, 4294967296L, 4294967297L, 8589934597L /* 2^33+5 */,
      -1L, -12345L, Long.MaxValue, Long.MinValue)
    val got = keys.toDF("k")
      .select($"k", LogModel.portableHash($"k").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val masked = BigInt(k) & BigInt(4294967295L)
      val expected = (masked * BigInt(2654435761L)) % BigInt(4294967296L)
      assert(BigInt(got(k)) === expected, s"key $k")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and the oracle keys are a subset") {
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() >= 0, name)
    }
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without queries: $unknown")
  }
}
