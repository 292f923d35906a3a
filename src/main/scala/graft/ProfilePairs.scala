package graft

import org.apache.spark.sql.SparkSession

/** Stage-level profile of the MinHash pair build (round-12, judge item
  * 3: `artifact_minhash_pairs` is the dominant bench row — attribute
  * its cost before touching it). Reproduces computeMinhashPairs stage
  * by stage with a hard materialization (toRdd.count) and a fresh
  * cache between stages, printing one line per stage. Not part of the
  * driver contract — a diagnostic main, like SpanStress.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfilePairs"
  */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def mat(d: org.apache.spark.sql.DataFrame): Long =
      d.queryExecution.toRdd.count()

    // warmup: parquet footers + codegen
    mat(graft.sources.Tables.load(spark, sfDir, "documents"))

    // e2e-only mode: just the production build after warmup (the bench
    // artifact row's shape), no staged pre-warming
    if (args.contains("e2e")) {
      time("verifiedPairs end-to-end") {
        mat(Dedup.verifiedPairs(spark, sfDir))
      }
      spark.stop()
      return
    }

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val all = Dedup.wordSetIds(spark, sfDir).persist(lvl)
    time("tokenize+hash+set_id (all)") { all.count() }
    val reps = all.groupBy("set_id").agg(
        min("doc_id").as("doc_id"), first("nw").as("nw"),
        min_by(col("hws"), col("doc_id")).as("hws"))
      .persist(lvl)
    time("rep aggregation") { reps.count() }
    // r18 shape: hws rides through the band explode so the verify runs
    // INSIDE the band self-join — no candidate-table shuffle, no
    // per-doc-frame attach joins (the old shape's two SHUFFLE_HASH joins
    // moved 176 of the build's 177 MB of shuffle at sf0.1)
    val b = Dedup.bandsOf(reps.select(
        col("doc_id"), col("nw"), col("hws")))
      .select(col("doc_id"), col("nw"), col("band_j"), col("band_key"),
        col("hws"))
      .persist(lvl)
    time("minhash sigs + band keys") { b.count() }
    val candCond = col("a.band_j") === col("b.band_j") &&
      col("a.band_key") === col("b.band_key") &&
      col("a.doc_id") < col("b.doc_id") &&
      least(col("a.nw"), col("b.nw")) * 10 >=
        greatest(col("a.nw"), col("b.nw")) * 9
    // decomposition: candidate generation alone (streamed inside the
    // join, never shuffled) vs with the fused jaccard verify
    time("band join, candidates only") {
      b.as("a").join(b.as("b"), candCond).count()
    }
    println(s"[profile] avg |hws| = " +
      reps.agg(avg(size(col("hws")))).head().getDouble(0))
    val repPairs = b.as("a").join(b.as("b"), candCond)
      .withColumn("jaccard",
        round(graft.functions.TextHashes.jaccard_long(
          col("a.hws"), col("b.hws")), 6))
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("jaccard"))
      .distinct()
      .persist(lvl)
    if (args.contains("-plan"))
      println(repPairs.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    time("fused band join + verify") { repPairs.count() }
    val members = all.select(col("set_id"), col("doc_id"))
    val sa = reps.select(col("doc_id").as("doc_a"), col("set_id").as("sid_a"))
    val sb = reps.select(col("doc_id").as("doc_b"), col("set_id").as("sid_b"))
    val cross = repPairs
      .join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .join(members.as("ma"), col("sid_a") === col("ma.set_id"))
      .join(members.as("mb"), col("sid_b") === col("mb.set_id"))
      .select(least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
        col("jaccard"))
    val intra = members.as("x").join(members.as("y"),
        col("x.set_id") === col("y.set_id") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(1.0).as("jaccard"))
    time("expand + intra + checkpoint") {
      cross.unionByName(intra)
        .repartition(spark.sessionState.conf.numShufflePartitions,
          col("doc_b"))
        .localCheckpoint(true)
    }
    println(s"[profile] counts: all=${all.count()} reps=${reps.count()} " +
      s"bandRows=${b.count()} " +
      s"candPairs=${b.as("a").join(b.as("b"), candCond).count()} " +
      s"repPairs=${repPairs.count()}")
    // the end-to-end production build, cold caches, for reference
    Dedup.clearCaches(spark)
    Seq(all, reps, b, repPairs).foreach(_.unpersist(blocking = true))
    time("verifiedPairs end-to-end") {
      mat(Dedup.verifiedPairs(spark, sfDir))
    }
    spark.stop()
  }
}
