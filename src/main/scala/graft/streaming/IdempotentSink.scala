package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once `foreachBatch` parquet sink (round-13 verdict #7): the
  * write side of the v2 streaming contract. The source side is already
  * exact (checkpointed byte offsets, lease-held tails); a plain
  * `df.write.mode("append")` inside `foreachBatch` is only at-least-once —
  * Structured Streaming replays the LAST batch after a crash between the
  * sink write and the checkpoint commit, duplicating every row of that
  * batch. The standard public fix (Spark's own FileStreamSink
  * `_spark_metadata` log; "idempotent writes by batchId" from the
  * Structured Streaming guide) is what this implements, reusable from any
  * `foreachBatch`:
  *
  *  - each batch lands in its own partition directory
  *    `out/batch_id=<id>/` (overwritten on retry, so a crash MID-write
  *    leaves no half-batch behind the marker);
  *  - a zero-byte commit marker `out/_commits/<id>` is created with
  *    create-exclusive semantics AFTER the data write — a replayed batch
  *    sees the marker and skips, so crash-after-commit-before-checkpoint
  *    (the at-least-once window) writes nothing twice;
  *  - readers go through [[committed]], which lists the marker dir and
  *    reads ONLY committed partitions — an uncommitted partial from a
  *    crashed attempt is invisible even before the retry overwrites it.
  *
  * 100 TB posture: the write path never lists data files (one directory
  * write + one O(1) marker create per batch); the read path lists one
  * metadata dir with #batches entries — the same cost class as Spark's
  * own metadata log. Batch directories fan out across executors like any
  * parquet write; nothing funnels through the driver.
  */
object IdempotentSink {

  private def commitsDir(outDir: String) = new Path(s"$outDir/_commits")
  private def markerPath(outDir: String, batchId: Long) =
    new Path(commitsDir(outDir), batchId.toString)

  /** Write `df` as batch `batchId` under `outDir`, exactly once across
    * replays. Returns true if this call performed the write, false if the
    * batch was already committed (a replay — skipped whole). */
  def write(df: DataFrame, batchId: Long, outDir: String): Boolean = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val marker = markerPath(outDir, batchId)
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return false // replayed batch: already committed
    // overwrite, not append: a previous CRASHED attempt of this same
    // batch may have left partial files in the directory
    df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    fs.mkdirs(commitsDir(outDir))
    // create-exclusive: two racing attempts of one batch (speculative
    // restart) cannot both claim the commit
    val out = fs.create(marker, false)
    out.close()
    true
  }

  /** A `foreachBatch` function writing exactly-once to `outDir`:
    * `stream.writeStream.foreachBatch(IdempotentSink.sink(out))`. */
  def sink(outDir: String): (DataFrame, Long) => Unit =
    (df, id) => { write(df, id, outDir); () }

  /** All COMMITTED batches under `outDir` (with the `batch_id` partition
    * column). Uncommitted partials from crashed attempts are invisible. */
  def committed(spark: SparkSession, outDir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = commitsDir(outDir)
    val fs = dir.getFileSystem(conf)
    val ids =
      if (!fs.exists(dir)) Seq.empty[Long]
      else fs.listStatus(dir).toSeq.flatMap(s =>
        scala.util.Try(s.getPath.getName.toLong).toOption)
    require(ids.nonEmpty, s"IdempotentSink.committed: no committed batches under $outDir")
    spark.read.option("basePath", outDir)
      .parquet(ids.sorted.map(id => s"$outDir/batch_id=$id"): _*)
  }
}
