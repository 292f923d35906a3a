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
  *  - each ATTEMPT writes to a unique staging directory
  *    `out/_staging/<id>-<uuid>/`, then publishes it with one directory
  *    RENAME to `out/batch_id=<id>/` — so the visible batch directory
  *    only ever holds a COMPLETE attempt's output, and no later attempt
  *    can scribble into it (the r17 lifecycle review's zombie-writer
  *    case: with in-place `mode("overwrite")`, a stalled duplicate
  *    attempt could delete the winner's files AFTER its commit marker
  *    landed, leaving a corrupt batch permanently marked committed);
  *  - a zero-byte commit marker `out/_commits/<id>` is created with
  *    create-exclusive semantics AFTER the publish — a replayed batch
  *    sees the marker and skips, so crash-after-commit-before-checkpoint
  *    (the at-least-once window) writes nothing twice;
  *  - readers go through [[committed]], which lists the marker dir and
  *    reads ONLY committed partitions — an unpublished staging attempt
  *    is invisible by construction.
  *
  * 100 TB posture: the write path never lists data files (one directory
  * write + one O(1) rename + one O(1) marker create per batch); the read
  * path lists one metadata dir with #batches entries — the same cost
  * class as Spark's own metadata log. Batch directories fan out across
  * executors like any parquet write; nothing funnels through the driver.
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
    // stage under an attempt-unique dir, publish by rename: the batch
    // directory is only ever CREATED whole, never mutated in place
    val staging = new Path(s"$outDir/_staging/batch_id=$batchId-" +
      java.util.UUID.randomUUID().toString)
    val dst = new Path(s"$outDir/batch_id=$batchId")
    df.write.parquet(staging.toString)
    def complete(d: Path) = fs.exists(new Path(d, "_SUCCESS"))
    // FileContext.rename WITHOUT overwrite, not FileSystem.rename: the
    // latter treats an existing dst DIRECTORY as "move src into it"
    // (POSIX mv semantics), which would nest the staging dir inside a
    // published batch; FileContext atomically fails on an existing dst
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
    def tryPublish(): Boolean =
      try { fc.rename(staging, dst); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if fs.exists(dst) => false
      }
    if (!tryPublish()) {
      // dst already exists. NEVER delete a potentially-committed dst —
      // that is the zombie-clobber this layout exists to prevent.
      if (fs.exists(marker)) {
        fs.delete(staging, true): Unit // a concurrent attempt committed
        return false
      }
      if (complete(dst)) {
        // a prior attempt crashed after its publish rename but before
        // its marker: its data is COMPLETE (renames are atomic and
        // post-full-write; _SUCCESS proves the write finished) — adopt
        // it and fall through to the marker
        fs.delete(staging, true): Unit
      } else {
        // an in-place partial from the pre-staging layout (legacy
        // crash): replace it with this attempt's complete output
        fs.delete(dst, true)
        if (!tryPublish()) {
          // lost a race to another attempt's publish: adopt theirs
          fs.delete(staging, true): Unit
          if (!complete(dst)) throw new IllegalStateException(
            s"IdempotentSink: cannot publish batch $batchId to $dst")
        }
      }
    }
    fs.mkdirs(commitsDir(outDir))
    // create-exclusive: two racing attempts of one batch (speculative
    // restart) cannot both claim the commit — and whichever claims it,
    // the data under dst is a complete attempt's output
    try { fs.create(marker, false).close() }
    catch { case _: java.io.IOException if fs.exists(marker) => () }
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
