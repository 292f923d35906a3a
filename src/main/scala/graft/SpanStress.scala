package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Span-family skew-plant stress harness (r10 verdict item 5): measures
  * `span_dedup` / `span_dedup_winnow` wall-time AND shuffle/window spill
  * with a boilerplate [[graft.operators.Curation.SpanWindowWords]]-gram
  * planted into a fraction of the corpus — the "license header in most
  * of the crawl" hazard that the min/max-window shape exists to survive.
  * ScaleGuardSpec pins the plan shape and exact answers at spec scale;
  * this main produces the measured data point at stress scale (sf1).
  *
  * Fair A/B: the plant is a same-plan conditional concat (`doc_id % 5 <
  * k`, k = 3 → 60 %, k = -1 → never), so the clean and planted runs
  * execute byte-identical plans modulo one literal — any delta is the
  * hot hash group, not plan differences.
  *
  * Usage: runMain graft.SpanStress <sfDir> <plantPct: 0|60>
  * Prints one JSON line with per-phase seconds (two trials each) and
  * the spill-byte deltas observed during each trial.
  */
object SpanStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val plantPct = if (args.length > 1) args(1).toInt else 0
    require(plantPct == 0 || plantPct == 60, s"plantPct 0|60, got $plantPct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    object spills extends SparkListener {
      @volatile var mem = 0L
      @volatile var disk = 0L
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          mem += m.memoryBytesSpilled
          disk += m.diskBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(spills)

    import graft.operators.Curation
    import graft.operators.TextAnalysis.tokens
    val W = Curation.SpanWindowWords
    val header = (1 to W).map(i => s"lic$i").mkString(" ")
    val k = if (plantPct == 60) 3L else -1L
    val toks = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        tokens(when(pmod(col("doc_id"), lit(5L)) < lit(k),
            concat_ws(" ", lit(header), col("text")))
          .otherwise(col("text"))).as("toks"))

    // warmup: scan + tokenize once so neither phase pays footer/JIT cost
    toks.queryExecution.toRdd.count()

    def measure(name: String, df: => org.apache.spark.sql.DataFrame)
        : (Seq[Double], Seq[(Long, Long)], Long) = {
      var rows = 0L
      val trials = (1 to 2).map { _ =>
        // let straggler task-end events drain so spill deltas attribute
        // to the right window (the listener bus is async)
        Thread.sleep(2000)
        val (m0, d0) = (spills.mem, spills.disk)
        val t0 = System.nanoTime()
        rows = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        (sec, (spills.mem - m0, spills.disk - d0))
      }
      System.err.println(s"[stress] $name: " +
        trials.map(t => f"${t._1}%.2f s").mkString(", "))
      (trials.map(_._1), trials.map(_._2), rows)
    }

    val (sdSec, sdSpill, sdRows) =
      measure("span_dedup(dupSpans)", Curation.dupSpans(toks))
    val (wSec, wSpill, wRows) =
      measure("span_dedup_winnow", Curation.spanDedupWinnowFrom(toks))

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    def spill(xs: Seq[(Long, Long)]) = xs.map { case (m, d) =>
      s"""{"mem_mb":${m / 1024 / 1024},"disk_mb":${d / 1024 / 1024}}"""
    }.mkString("[", ",", "]")
    println(s"""{"sf":"$sfDir","plant_pct":$plantPct,""" +
      s""""span_dedup":{"sec":${arr(sdSec)},"spill":${spill(sdSpill)},"rows":$sdRows},""" +
      s""""span_dedup_winnow":{"sec":${arr(wSec)},"spill":${spill(wSpill)},"rows":$wRows}}""")
    spark.stop()
  }
}
