package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms over the `events` table (SURVEY.md §2.11).
  * The reference is micro-batch-only; these are the Structured
  * Streaming equivalents of its semantics — every function takes a
  * DataFrame and works identically on a batch frame (used by the
  * oracle gate) and a streaming frame (used by StreamingSpec with a
  * MemoryStream source):
  *
  *   - watermark ≅ the reference's effective-start-date (S3)
  *   - dropDuplicates within watermark ≅ overlap-window reprocessing
  *   - tumbling/session windows are the new capability the reference
  *     lacks.
  */
object EventsStream {

  /** Tumbling 1-hour windows with a 1-day watermark; counts + exact sums. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes: each event lands in two
    * overlapping windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"))

  /** Session windows per user with a 30-minute gap. */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** Late-data dedup within the watermark (overlap-window reprocessing ≅
    * idempotent PK upsert, S6 semantics in streaming form). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day").dropDuplicates("event_id")

  /** Stream-stream interval join: each purchase attributed to every
    * click by the same user in the preceding hour. Both sides carry
    * watermarks, so the join state is BOUNDED — Spark co-partitions both
    * streams on user_id and evicts click state once the purchase-side
    * watermark passes click_ts + 1h; at 100 TB/day the state per
    * executor is one hour of clicks for its key range, not the stream's
    * history. Works identically on batch frames (oracle-gated as
    * `st_interval_join`). */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
    c.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_timestamp(col("click_ts")).as("click_epoch"),
        unix_timestamp(col("purchase_ts")).as("purchase_epoch"),
        col("amount"))
  }

  /** Custom per-key state via flatMapGroupsWithState: running per-user
    * totals with an alert emitted each time the cumulative value crosses
    * another multiple of `threshold` — state the built-in windows can't
    * express (KeyValueGroupedDataset state API, SURVEY §2.8). */
  def runningTotalsWithAlerts(
      events: org.apache.spark.sql.Dataset[UserEvent],
      threshold: Double): org.apache.spark.sql.Dataset[UserAlert] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[RunningTotal]) => {
          var cur = state.getOption.getOrElse(RunningTotal(0.0, 0L))
          val alerts = scala.collection.mutable.ListBuffer.empty[UserAlert]
          rows.foreach { e =>
            val next = RunningTotal(cur.total + e.value, cur.n + 1)
            if ((next.total / threshold).toLong > (cur.total / threshold).toLong)
              alerts += UserAlert(userId, next.total, next.n)
            cur = next
          }
          state.update(cur)
          alerts.iterator
        })
  }
}

final case class UserEvent(user_id: Long, value: Double)
final case class RunningTotal(total: Double, n: Long)
final case class UserAlert(user_id: Long, total: Double, n: Long)
