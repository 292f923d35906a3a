package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming consumer-group offset tracker — the Structured Streaming
  * analog of the reference's OffsetTracker (G1-G4,
  * `flyq-server/src/core/offset_tracker.rs`): state = committed offset per
  * (group, partition); commits upsert it; Spark's checkpoint subsumes the
  * reference's dirty-set + 5 s JSON flush loop (`runtime/flush.rs:9-39`).
  *
  * Two deliberate divergences, both documented in SURVEY.md §7.4:
  *  - commits are monotone (max-wins) rather than arrival-order overwrite,
  *    because micro-batch arrival order is not total; consumer progress is
  *    monotone in practice and this makes the operator order-insensitive;
  *  - state can be bounded: pass `idleTimeout = Some(d)` to evict groups
  *    idle past `d` (the reference's JSON store grows forever).
  *
  * Eviction is OPT-IN (default `NoTimeout`): with a processing-time timeout,
  * Spark schedules micro-batches continuously just to fire timeouts, so a
  * default-trigger query never quiesces (`processAllAvailable` livelocks —
  * round-1 verdict). Callers who want eviction should pair
  * `idleTimeout = Some(..)` with a periodic trigger.
  */
object GroupOffsets {

  case class Commit(grp: String, partId: Long, offset: Long)
  case class Committed(grp: String, partId: Long, committed: Long)

  /** The state-transition function, exposed so the timeout/eviction branch
    * is unit-testable with TestGroupState (no live stream needed). */
  def updateGroup(key: (String, Long), rows: Iterator[Commit],
                  state: GroupState[Long],
                  idleTimeout: Option[String]): Iterator[Committed] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val incoming = rows.map(_.offset).max
      val next = math.max(state.getOption.getOrElse(-1L), incoming)
      state.update(next)
      idleTimeout.foreach(state.setTimeoutDuration)
      Iterator.single(Committed(key._1, key._2, next))
    }

  def track(commits: Dataset[Commit],
            idleTimeout: Option[String] = None): Dataset[Committed] = {
    import commits.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    commits.groupByKey(c => (c.grp, c.partId))
      .flatMapGroupsWithState[Long, Committed](
        OutputMode.Update(), timeoutConf)(updateGroup(_, _, _, idleTimeout))
  }
}
