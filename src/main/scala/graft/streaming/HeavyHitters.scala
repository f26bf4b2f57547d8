package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Bounded-state heavy hitters over an unbounded stream (SURVEY §2.11
  * depth): a Misra–Gries summary per user maintained in
  * mapGroupsWithState. The state is O(k) counters per key REGARDLESS of
  * stream length — the property that makes per-key "top event types"
  * feasible when a key's history is months of events: the built-in
  * windowed counts would need one state row per (key, type), unbounded
  * in the type cardinality, and a full count table per key otherwise.
  *
  * Guarantee (classic Misra–Gries with k counters): each counter
  * undercounts its item by at most n/(k+1) where n is the number of
  * items the key has processed, so every item with true frequency
  * > n/(k+1) is guaranteed present in the summary. HeavyHittersSpec
  * pins both bounds with a ScalaCheck property over the pure kernel.
  */
object HeavyHitters {

  final case class MgState(counters: Map[String, Long], processed: Long)

  /** One Misra–Gries step: increment a tracked item, adopt the item into
    * a free counter, or decrement ALL counters (dropping zeros). */
  def mgAdd(s: MgState, item: String, k: Int): MgState = {
    val c = s.counters
    val next =
      if (c.contains(item)) c.updated(item, c(item) + 1L)
      else if (c.size < k) c.updated(item, 1L)
      else c.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    MgState(next, s.processed + 1L)
  }

  /** Current summary for one key: the top surviving counter (count
    * tiebroken by item so the emission is deterministic) plus the full
    * counter key set for auditability. */
  def summarize(userId: Long, s: MgState): MgSummary = {
    val (topType, topLb) =
      if (s.counters.isEmpty) ("", 0L)
      else s.counters.toSeq.minBy { case (ty, n) => (-n, ty) }
    MgSummary(userId, s.processed, topType, topLb,
      s.counters.size, s.counters.keys.toSeq.sorted.mkString(","))
  }

  /** Streaming maintainer: per micro-batch, fold the key's new events
    * into its summary and emit the refreshed top — Update-mode output,
    * state carried across batches. Works identically on a batch
    * Dataset (mapGroupsWithState executes one "batch"). */
  def topTypesPerUser(
      events: Dataset[TypedEvent], k: Int): Dataset[MgSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (userId: Long, rows: Iterator[TypedEvent], state: GroupState[MgState]) => {
          var cur = state.getOption.getOrElse(MgState(Map.empty, 0L))
          rows.foreach(e => cur = mgAdd(cur, e.event_type, k))
          state.update(cur)
          summarize(userId, cur)
        })
  }
}

final case class TypedEvent(user_id: Long, event_type: String)
final case class MgSummary(
    user_id: Long, processed: Long, top_type: String, top_lb: Long,
    n_counters: Int, counter_keys: String)
