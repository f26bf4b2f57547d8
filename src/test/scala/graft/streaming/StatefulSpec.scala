package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** flatMapGroupsWithState custom state: running per-user totals that
  * alert on each threshold crossing, with state carried across
  * micro-batches.
  */
class StatefulSpec extends SparkTestBase {
  import spark.implicits._

  test("running totals alert on threshold crossings and state survives batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = EventsStream.runningTotalsWithAlerts(mem.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: user 1 reaches 9 (no alert), user 2 crosses 10 at 12
    mem.addData(UserEvent(1, 4.0), UserEvent(1, 5.0), UserEvent(2, 12.0))
    q.processAllAvailable()
    // batch 2: user 1's +3 crosses 10 (state 9 carried over);
    //          user 2's +9 crosses 20 (12 -> 21)
    mem.addData(UserEvent(1, 3.0), UserEvent(2, 9.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("alerts").orderBy("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 12.0, 3L), (2L, 12.0, 1L), (2L, 21.0, 2L)))
  }
}
