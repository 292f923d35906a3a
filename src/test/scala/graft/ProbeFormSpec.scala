package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.PipelineStreams

/** Round-15 (r14 verdict #4): pushed-vs-plain gate probe selection is
  * MEASURED at index build time, not hand-picked per family. The layout
  * statistic (`Dedup.measureProbeAmp`) must separate the two regimes the
  * r14 single-run gate table measured: ngram/minhash key layouts where
  * the pushed IN prunes to the pages the keys touch (pushdown won), and
  * the simhash layout where a short key interleaved under 20 combo_j
  * runs defeats page pruning (pushed read 91 MB / 30.7 s vs plain
  * 2 MB / 1.5 s — built, measured, removed). */
class ProbeFormSpec extends AnyFunSuite {
  private lazy val spark = Testing.spark
  private val sf = "/root/testdata/sf0.1"

  private def keyRuns(table: String): Double =
    spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .collectFirst {
        case r if r.getString(0) == "graft.key_runs" =>
          r.getString(1).toDouble
      }.get

  test("probe-form stamp: ngram/minhash layouts measure pushed, simhash plain") {
    val builds = Seq[(String, String => Unit, String)](
      ("pf_ngram", t => Dedup.writeNgramIndexTable(spark, sf, t, 8), "pushed"),
      ("pf_minhash", t => Dedup.writeMinhashIndexTable(spark, sf, t, 8), "pushed"),
      ("pf_simhash", t => Dedup.writeSimhashIndexTable(spark, sf, t, 8), "plain"))
    try {
      builds.foreach { case (t, build, want) =>
        build(t)
        val runs = keyRuns(t)
        info(f"$t: key_runs=$runs%.2f form=${Dedup.gateProbeForm(spark, t).get}")
        assert(Dedup.gateProbeForm(spark, t) === Some(want),
          f"$t measured key_runs=$runs%.2f")
      }
    } finally builds.foreach { case (t, _, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("a degenerate ngram key layout stamps plain and routes the auto " +
      "writer off the pushed path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.PipelineStreams.StreamDoc
    import spark.implicits._
    val good = "pf_auto_good"
    val bad = "pf_auto_bad"
    Dedup.writeNgramIndexTable(spark, sf, good, 8)
    // the silent-degradation case the stamp exists to catch: same
    // banding, same bucketing, but the file sort no longer places pkey
    // in tight runs (sorted by base_id — each doc's band rows adjacent,
    // keys scattered through every file)
    Dedup.ngramGateIndex(spark, sf).write.mode("overwrite")
      .bucketBy(8, "band_j", "pkey").sortBy("base_id")
      .saveAsTable(bad)
    spark.sql(s"ALTER TABLE $bad SET TBLPROPERTIES" +
      s"('graft.banding' = '${Dedup.NgramBanding}')")
    val (badRuns, badForm) = Dedup.stampProbeStats(spark, bad, "pkey")
    try {
      info(f"degenerate layout: key_runs=$badRuns%.2f form=$badForm")
      assert(badForm === "plain", f"key_runs=$badRuns%.2f")
      assert(Dedup.gateProbeForm(spark, good) === Some("pushed"))

      // the auto writer obeys the stamp: pushed plan on the good index,
      // no pushed key filter on the degenerate one — same answers
      def runAuto(table: String): (Set[Long], String) = {
        val input = MemoryStream[StreamDoc](spark)
        var plan = ""
        var ids = Set.empty[Long]
        val q = PipelineStreams.ngramNearDupWriter(
            spark, input.toDF(), table) { (df, _) =>
            plan = df.queryExecution.executedPlan.toString
            ids = df.select("doc_id").collect().map(_.getLong(0)).toSet
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"pf_$table").toString)
          .start()
        try {
          val probe = graft.sources.Tables.load(spark, sf, "documents")
            .filter(col("doc_id") % 101 === 0)
            .select("doc_id", "lang", "text")
            .collect().map(r => StreamDoc(r.getLong(0), r.getString(1),
              r.getString(2), new java.sql.Timestamp(0L)))
          input.addData(probe.toIndexedSeq: _*)
          q.processAllAvailable()
        } finally q.stop()
        (ids, plan)
      }
      val (goodIds, goodPlan) = runAuto(good)
      val (badIds, badPlan) = runAuto(bad)
      assert(goodPlan.contains("PushedFilters: [In(pkey"),
        goodPlan.take(2000))
      assert(!badPlan.contains("PushedFilters: [In(pkey"),
        badPlan.take(2000))
      assert(goodIds === badIds)
      assert(goodIds.nonEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $good")
      spark.sql(s"DROP TABLE IF EXISTS $bad")
    }
  }

  test("an unstamped (pre-r15) index fails fast with the rebuild hint") {
    import spark.implicits._
    val table = "pf_unstamped"
    Dedup.ngramGateIndex(spark, sf).limit(100).write.mode("overwrite")
      .bucketBy(4, "band_j", "pkey").sortBy("band_j", "pkey")
      .saveAsTable(table)
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES" +
      s"('graft.banding' = '${Dedup.NgramBanding}')")
    try {
      val e = intercept[IllegalArgumentException] {
        PipelineStreams.ngramNearDupWriter(spark,
          org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[graft.streaming.PipelineStreams.StreamDoc](spark)
            .toDF(), table)((_, _) => ())
      }
      assert(e.getMessage.contains("graft.probe_form"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
  }

  test("pushed writer restores the session IN-pushdown threshold after " +
      "the batch drains (no net session-conf change)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.PipelineStreams.StreamDoc
    import spark.implicits._
    val table = "pf_restore"
    Dedup.writeNgramIndexTable(spark, sf, table, 8)
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    // pin a known prior (the direct-API tests elsewhere may have left it
    // raised — the scope must restore to WHATEVER was set before)
    spark.conf.set(key, "10")
    try {
      val input = MemoryStream[StreamDoc](spark)
      var sawRaised = false
      val q = PipelineStreams.ngramNearDupPushedWriter(
          spark, input.toDF(), table) { (df, _) =>
          df.collect(): Unit // the action runs inside the scope
          sawRaised = spark.conf.get(key).toInt > PipelineStreams.PushChunk
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("pf_restore").toString)
        .start()
      try {
        val doc = graft.sources.Tables.load(spark, sf, "documents")
          .select("doc_id", "lang", "text").head()
        input.addData(StreamDoc(doc.getLong(0), doc.getString(1),
          doc.getString(2), new java.sql.Timestamp(0L)))
        q.processAllAvailable()
      } finally q.stop()
      assert(sawRaised, "threshold was not raised during the batch")
      assert(spark.conf.get(key) === "10",
        "threshold not restored after the pushed batch drained")
    } finally {
      spark.conf.unset(key)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("spark.graft.pushdown.chunk is validated with an error naming the conf") {
    for (bogus <- Seq("abc", "0", "-5")) {
      spark.conf.set(PipelineStreams.PushChunkConf, bogus)
      try {
        val e = intercept[IllegalArgumentException] {
          PipelineStreams.configuredChunk(spark)
        }
        assert(e.getMessage.contains(PipelineStreams.PushChunkConf), bogus)
        assert(e.getMessage.contains(bogus))
      } finally spark.conf.unset(PipelineStreams.PushChunkConf)
    }
    assert(PipelineStreams.configuredChunk(spark) ===
      PipelineStreams.PushChunk)
  }
}
