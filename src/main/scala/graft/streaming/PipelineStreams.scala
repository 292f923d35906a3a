package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming twins of the training-data-pipeline operators: the batch
  * dedup/sampling semantics applied to an unbounded document stream.
  *
  * Scale posture: exact dedup keeps ONE state entry per distinct content
  * hash inside the watermark horizon (state is bounded by time, not
  * stream length — the standard production shape for streaming dedup);
  * stratified sampling is a stateless per-row hash predicate after a
  * stream-static broadcast join, so it adds no state at all.
  */
object PipelineStreams {

  /** Typed row for document streams (tests / MemoryStream drivers). */
  case class StreamDoc(doc_id: Long, lang: String, text: String,
                       event_ts: java.sql.Timestamp)

  /** Streaming exact dedup: same content identity as the batch
    * `dedup_exact` (sha256 of the canonically normalized text), with
    * duplicates suppressed inside the event-time watermark horizon via
    * `dropDuplicatesWithinWatermark` — re-emission after the horizon is
    * the documented trade for bounded state (a batch `dedup_exact` pass
    * downstream reconciles the tail, the usual lambda-style split).
    *
    * `docs` must carry an `event_ts` timestamp column (used only to bound
    * state) plus `doc_id`/`text`. */
  def exactDedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(TextAnalysis.normText(col("text")), 256))
      .withWatermark("event_ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Streaming stratified sample: the deterministic hash-mod decision of
    * `Sampling.stratifiedSample` applied to a document stream. The rate
    * plan is computed ONCE from a reference corpus (a batch table — the
    * mix you are steering toward) and broadcast into the stream as a
    * stream-static join; the decision itself is the same salted md5
    * bucket predicate, so a document sampled in a re-run, a backfill, or
    * the batch path is sampled here too. */
  def stratifiedSampleStream(spark: SparkSession, docs: DataFrame,
                             planSfDir: String): DataFrame =
    graft.operators.Sampling.applySampleDecision(
      docs, graft.operators.Sampling.samplePlan(spark, planSfDir))
}
