package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One sequence event for the Markov maintainer (a projection of the
  * events table). */
case class SeqEvent(
    user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)

/** Buffered not-yet-finalized event (event-time ms for cheap state). */
case class BufEvent(tsMs: Long, event_id: Long, event_type: String)

/** Per-user state: the unfinalized tail of the sequence plus the type of
  * the last FINALIZED event (the boundary a cross-batch transition hangs
  * from). */
case class MarkovState(buffer: Seq[BufEvent], lastType: Option[String])

/** Aggregated transition deltas emitted by one user in one micro-batch. */
case class TransitionDelta(user_id: Long, cur: String, nxt: String, n: Long)

/** Streaming face of w26_markov_transitions: the per-user event-sequence
  * transition counts kept current as events stream in.
  *
  * Design-space counterpoint to [[FunnelMaintainer]]: the funnel cascade
  * is not prefix-monotone under out-of-order arrival, so it recomputes
  * touched users from the log. Transition counting IS prefix-monotone
  * once events are watermark-finalized in (ts, event_id) order — exactly
  * the shape `flatMapGroupsWithState` bounded state wants:
  *
  *   - each user's state holds ONLY the events newer than the watermark
  *     (bounded by watermark-lag x per-user rate) plus one boundary type;
  *   - at every trigger the sorted prefix older than the watermark is
  *     finalized: its transitions are emitted as (cur, nxt, n) deltas and
  *     the events leave the state for good;
  *   - out-of-order events within the watermark sort into place before
  *     finalization, so the accumulated deltas equal the BATCH w26
  *     matrix on the same rows (spec-pinned). Data later than the
  *     watermark follows the standard watermark contract (sequenced at
  *     arrival against the already-finalized boundary).
  *
  * Deltas are grain-free facts: `transitionTable` folds them into the
  * w26 matrix shape; a production sink would MERGE them into a running
  * counts table (same versioned-parquet story as [[DriftMonitor]]).
  */
object MarkovStream {

  def transitionDeltas(events: Dataset[SeqEvent]): Dataset[TransitionDelta] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[SeqEvent], state: GroupState[MarkovState]) =>
          val st = state.getOption.getOrElse(MarkovState(Nil, None))
          val merged = (st.buffer ++ it.map(e =>
            BufEvent(e.ts.getTime, e.event_id, e.event_type)))
            .sortBy(e => (e.tsMs, e.event_id))
          val w = state.getCurrentWatermarkMs()
          val (ripe, rest) = merged.partition(_.tsMs < w)
          var last = st.lastType
          val counts = scala.collection.mutable.LinkedHashMap[(String, String), Long]()
          ripe.foreach { e =>
            last.foreach { l =>
              val k = (l, e.event_type)
              counts(k) = counts.getOrElse(k, 0L) + 1
            }
            last = Some(e.event_type)
          }
          state.update(MarkovState(rest, last))
          counts.iterator.map { case ((c, x), n) => TransitionDelta(uid, c, x, n) }
      }
  }

  /** Fold accumulated deltas into the w26 matrix shape (counts + row-
    * normalized probabilities). Works on the memory-sink table in specs
    * and on a merged counts table in production. */
  def transitionTable(deltas: DataFrame): DataFrame = {
    val tr = deltas.groupBy(col("cur"), col("nxt"))
      .agg(sum(col("n")).as("transitions")).cache()
    val tot = tr.groupBy(col("cur")).agg(sum(col("transitions")).as("tot"))
      .select(col("cur").as("cur_t"), col("tot"))
    tr.join(broadcast(tot), col("cur") === col("cur_t"))
      .select(col("cur").as("cur_type"), col("nxt").as("next_type"),
        col("transitions"),
        round(col("transitions") / col("tot").cast("double"), 6).as("prob"))
  }
}
