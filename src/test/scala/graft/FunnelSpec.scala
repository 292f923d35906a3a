package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Funnel + cohort-retention invariants, with the funnel fold
  * cross-checked against an independent plain-Scala replay (the oracle
  * pins exact values; this pins the state-machine semantics). */
class FunnelSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("event_funnel matches a plain-Scala replay of the state machine") {
    val windowMs = Relational.FunnelWindowMs
    assert(Relational.FunnelWindow === "3 day" &&
      windowMs === 3L * 24 * 3600 * 1000)
    val events = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val steps = Relational.FunnelSteps
    val expected = events.groupBy(_._1).values.map { evs =>
      var stage = 0
      var t = 0L
      var t1 = 0L
      evs.sortBy(e => (e._2, e._3)).foreach { case (_, ts, _, tpe) =>
        if (stage < steps.length && tpe == steps(stage) &&
            (stage == 0 || (ts > t && ts <= t1 + windowMs))) {
          if (stage == 0) t1 = ts
          t = ts
          stage += 1
        }
      }
      stage
    }.toSeq
    val want = (1 to steps.length)
      .map(k => k.toLong -> expected.count(_ >= k).toLong).toMap
    val got = Relational.eventFunnel(spark, sf)
      .select("step_idx", "n_users").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the falloff is real on the testdata: strictly fewer users at the
    // last step than the first, and the funnel is monotone
    assert(got(steps.length.toLong) < got(1L))
    (2 to steps.length).foreach(k => assert(got(k.toLong) <= got(k - 1L)))
  }

  test("hourly_anomalies: integer flag brackets the display z, counts conserve") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val a = Relational.hourlyAnomalies(spark, sf).cache()
    // every event lands in exactly one (type, hour) cell
    assert(a.agg(sum("n_events")).head().getLong(0) === ev.count())
    // the exact integer decision agrees with the rounded display z up to
    // rounding slack at the threshold
    val zt = Relational.AnomalyZ.toDouble
    assert(a.filter($"is_anomaly" && abs($"z_score") < zt - 0.001).count() === 0)
    assert(a.filter(!$"is_anomaly" && abs($"z_score") > zt + 0.001).count() === 0)
    // the testdata's uniform traffic still has tail hours on both sides
    assert(a.filter($"is_anomaly").count() > 0)
    assert(a.filter(!$"is_anomaly").count() > 0)
    a.unpersist()
  }

  test("cohort_retention: day-0 covers every signup user, matrix is sane") {
    val r = Relational.cohortRetention(spark, sf).cache()
    val signupUsers = graft.sources.Tables.load(spark, sf, "events")
      .filter($"event_type" === "signup").select("user_id").distinct().count()
    assert(r.filter($"days_since" === 0).agg(sum("n_users")).head().getLong(0)
      === signupUsers)
    assert(r.filter($"days_since" < 0 || $"n_users" < 1).count() === 0)
    // multiple cohorts and multiple retention days exist at this SF
    assert(r.select("cohort_day").distinct().count() > 1)
    assert(r.select("days_since").distinct().count() > 1)
    r.unpersist()
  }

  test("zorder: a user_id outside the ZBits domain fails loudly, not silently aliased") {
    import spark.implicits._
    // ts as epoch-NANOS long — the pyarrow TIMESTAMP(NS) layout Tables.load expects
    val bad = Seq((1L << Relational.ZBits,
        java.sql.Timestamp.valueOf("2024-01-05 10:00:00").getTime * 1000000L))
      .toDF("user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("zbad").toString
    bad.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[Exception] {
      Relational.zorderLayout(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("zorder: user_id outside")), e.toString)
  }

  test("zorder_layout: every bucket bounds BOTH dimensions at once") {
    val r = Relational.zorderLayout(spark, sf).collect()
    assert(r.nonEmpty)
    val half = 1L << (Relational.ZBucketShift / 2)
    r.foreach { row =>
      // the z-curve guarantee: fixing the bucket's high interleaved bits
      // bounds each dimension's spread to 2^(shift/2)
      assert(row.getAs[Long]("u_max") - row.getAs[Long]("u_min") < half,
        row.toString)
      assert(row.getAs[Long]("h_max") - row.getAs[Long]("h_min") < half,
        row.toString)
    }
    // all events land in exactly one bucket
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    assert(r.map(_.getAs[Long]("n_events")).sum === total)
    // and the buckets collectively still span (almost) the full month —
    // i.e. no single-column sort could have produced this: at least two
    // buckets overlap in u-range while being disjoint in h-range
    val spans = r.map(x => (x.getAs[Long]("u_min"), x.getAs[Long]("u_max"),
      x.getAs[Long]("h_min"), x.getAs[Long]("h_max")))
    val crossing = for {
      a <- spans; b <- spans
      if a._2 >= b._1 && b._2 >= a._1 // u-ranges overlap
      if a._4 < b._3 || b._4 < a._3 // h-ranges disjoint
    } yield (a, b)
    assert(crossing.nonEmpty,
      "buckets look like a single-column sort, not a z-curve")
  }

  test("incremental_agg: delta-merged rollup equals the full recompute") {
    // the maintenance invariant: merging the late batch's aggregates into
    // the base aggregates must be indistinguishable from rebuilding the
    // rollup over everything — counts exactly, decimal totals exactly
    val merged = Relational.incrementalAgg(spark, sf)
      .select("event_type", "day_idx", "n_events", "total_value")
    val full = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(date_trunc("day", col("ts")),
          lit("2024-01-01").cast("timestamp")).cast("long").as("day_idx"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
    // and the split actually exercises both sides
    val r = Relational.incrementalAgg(spark, sf)
    assert(r.filter($"n_delta" > 0).count() > 0)
    assert(r.filter($"n_base" > 0).count() > 0)
  }

  test("z-order writer: one file per bucket, file-level stats bound both dims") {
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    val manifest = Relational.writeZOrdered(spark, sf, out).cache()
    val half = 1L << (Relational.ZBucketShift / 2)
    val rows = manifest.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("u_max") - r.getAs[Long]("u_min") < half, r.toString)
      assert(r.getAs[Long]("h_max") - r.getAs[Long]("h_min") < half, r.toString)
    }
    // exactly one physical file per zbucket, nothing lost
    val nBuckets = Relational.zorderLayout(spark, sf).count()
    assert(rows.length.toLong === nBuckets)
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === total)
    manifest.unpersist()
  }

  test("json_props_rollup: parse outcomes partition the events exactly") {
    val r = Relational.jsonPropsRollup(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_events")
      val bad = row.getAs[Long]("n_bad")
      val miss = row.getAs[Long]("n_missing_k")
      val k = row.getAs[Long]("n_k")
      // the three outcomes are exhaustive and disjoint per event
      assert(bad + miss + k === n, row.toString)
      // the mangling really plants all three classes in every type
      assert(bad > 0 && miss > 0 && k > 0, row.toString)
      assert(row.getAs[Long]("min_k") <= row.getAs[Long]("max_k"))
    }
  }

  test("winsorize: clamp stays inside bounds, untouched middle, ~2% tails clipped") {
    val w = graft.operators.Relational.winsorize(spark, sf).cache()
    // the winsorized value never leaves [lo, hi], and a row is altered
    // iff one of its clip flags fired
    assert(w.filter($"value_wins" < $"lo" || $"value_wins" > $"hi")
      .count() === 0)
    // unflagged rows pass through unchanged (the converse can collapse
    // at the 1e-6 rounding boundary, so only this direction is exact)
    assert(w.filter(!$"clip_low" && !$"clip_high" &&
      round($"value", 6) =!= $"value_wins").count() === 0)
    // per type, each tail clips ≤ the quantile mass plus interpolation
    // slack, and SOMETHING clips (the bounds are interior percentiles)
    val per = w.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(when($"clip_low", 1L).otherwise(0L)).as("nlo"),
      sum(when($"clip_high", 1L).otherwise(0L)).as("nhi")).collect()
    per.foreach { r =>
      val (n, nlo, nhi) =
        (r.getAs[Long]("n"), r.getAs[Long]("nlo"), r.getAs[Long]("nhi"))
      assert(nlo > 0 && nhi > 0, r.toString)
      assert(nlo <= n * 2 / 100 + 1, r.toString)
      assert(nhi <= n * 2 / 100 + 1, r.toString)
    }
    w.unpersist()
  }
}
