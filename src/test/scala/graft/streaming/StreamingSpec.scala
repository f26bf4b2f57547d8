package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.merge.MergeKernels

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming smoke tests (SURVEY.md §2.11): the EventsStream
  * transforms running over a genuine streaming source, watermark late-data
  * handling, and a foreachBatch MERGE using the S6 kernel — the streaming
  * face of the reference's overlap-window upsert ingestion.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window counts over a MemoryStream source") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:45:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 11:10:00"), 2, "view", 3.0))
    val q = EventsStream.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("tumbling")
      .orderBy("window_start", "event_type").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2)       // two clicks in the 10:00 window
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
    assert(rows(1).getAs[Long]("n") == 1)
  }

  test("watermark drops data later than 1 day behind the max event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()
    // batch 1 advances the watermark to 2024-01-09 10:00
    mem.addData(Ev(1, ts("2024-01-10 10:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: one on-time row and one 9-days-late row (before watermark)
    mem.addData(
      Ev(2, ts("2024-01-10 11:00:00"), 1, "click", 1.0),
      Ev(3, ts("2024-01-01 00:00:00"), 1, "click", 99.0))
    q.processAllAvailable()
    // batch 3 pushes event time far ahead so earlier windows finalize
    mem.addData(Ev(4, ts("2024-01-20 00:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("late")
    // the late 2024-01-01 row must never appear in a finalized window
    assert(emitted.filter(col("sum_value") === 99.0).isEmpty)
    assert(emitted.filter(col("window_start") === lit(1704880800L)).count() == 1)
  }

  test("sessionization over a stream matches the 30-minute gap rule") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),  // session A
      Ev(2, ts("2024-01-01 10:20:00"), 7, "click", 1.0),  // merges (gap 20m)
      Ev(3, ts("2024-01-01 11:30:00"), 7, "click", 1.0))  // new session (gap 70m)
    val q = EventsStream.sessionized(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("sessions").orderBy("session_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_events") == 2)
    // session end = last event + 30 min
    assert(rows(0).getAs[Long]("session_end") -
      rows(0).getAs[Long]("session_start") == 50 * 60)
  }

  test("foreachBatch MERGE: streaming upsert via the S6 kernel is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    var target = Seq((1L, "old", 10.0), (2L, "keep", 20.0)).toDF("pk", "status", "v")
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "new", 11.0),
      Ev(3, ts("2024-01-01 10:00:00"), 3, "ins", 30.0))
    val q = EventsStream.dedupWithinWatermark(mem.toDF())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val staged = batch.select(col("event_id").as("pk"),
          col("event_type").as("status"), col("value").as("v"))
        target = MergeKernels.upsertClassify(target, staged, Seq("pk"))
          .drop("op")
          .localCheckpoint()  // materialize: target mutates across batches
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = target.orderBy("pk").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getString(1) == "new")     // updated
    assert(out(1).getString(1) == "keep")    // kept
    assert(out(2).getString(1) == "ins")     // inserted
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      Ev(2, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 10:00:00"), 2, "click", 0.0))
    purchases.addData(
      Ev(10, ts("2024-01-01 10:45:00"), 1, "purchase", 99.0),  // joins clicks 1+2
      Ev(11, ts("2024-01-01 12:30:00"), 2, "purchase", 5.0))   // >1h after click 3
    val q = EventsStream.attributedPurchases(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("attrib").orderBy("click_id").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("click_id")).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.getAs[Long]("purchase_id") == 10L))
    assert(rows.forall(_.getAs[Double]("amount") == 99.0))
  }
}
