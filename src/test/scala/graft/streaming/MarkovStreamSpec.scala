package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** The streaming Markov maintainer must converge to the BATCH w26
  * matrix on the same rows, including out-of-order arrival within the
  * watermark and transitions that span micro-batches.
  */
class MarkovStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("watermark-finalized deltas equal the batch transition matrix; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = MarkovStream.transitionDeltas(mem.toDS())
      .writeStream.format("memory").queryName("markov_deltas")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: user 1's first two events arrive OUT OF ORDER (click
    // before view); user 7 advances the clock so the watermark (max-10m)
    // will pass them
    mem.addData(
      SeqEvent(1, ts(5), 102, "click"),
      SeqEvent(1, ts(0), 101, "view"),
      SeqEvent(7, ts(30), 700, "tick"))
    q.processAllAvailable()
    // batch 2: watermark is now ts(20) — user 1's buffer finalizes in
    // sorted order (view -> click). A third user-1 event lands UNDER the
    // new watermark horizon but after the finalized boundary: sequenced
    // against lastType=click (cross-batch transition).
    mem.addData(SeqEvent(1, ts(12), 103, "purchase"),
      SeqEvent(7, ts(31), 701, "tick"))
    q.processAllAvailable()
    // batch 3: nothing new for user 1 — no further user-1 deltas
    mem.addData(SeqEvent(7, ts(32), 702, "tick"))
    q.processAllAvailable()
    q.stop()

    val deltas = spark.table("markov_deltas").filter(col("user_id") === 1)
    val got = MarkovStream.transitionTable(deltas)
      .orderBy("cur_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("click", "purchase", 1L, 1.0),
      ("view", "click", 1L, 1.0)), got.mkString(","))

    // batch equivalence: the same rows through the w26 lead() formulation
    val batch = Seq(
      (1L, ts(0), 101L, "view"), (1L, ts(5), 102L, "click"),
      (1L, ts(12), 103L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val seq = batch.select(col("event_type").as("cur"),
      lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
        .as("nxt")).filter(col("nxt").isNotNull)
    val expect = seq.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      .orderBy("cur", "nxt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(expect.toSeq == got.map(t => (t._1, t._2, t._3)).toSeq)
  }

  test("single-event users emit no transitions; ticks never cross users") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = MarkovStream.transitionDeltas(mem.toDS())
      .writeStream.format("memory").queryName("markov_single")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(SeqEvent(1, ts(0), 1, "view"), SeqEvent(2, ts(1), 2, "click"),
      SeqEvent(9, ts(60), 9, "tick"))
    q.processAllAvailable()
    mem.addData(SeqEvent(9, ts(61), 10, "tick"))
    q.processAllAvailable()
    q.stop()
    // users 1 and 2 each finalized exactly one event: zero transitions,
    // and nothing ever pairs across users
    assert(spark.table("markov_single")
      .filter(col("user_id").isin(1, 2)).count() == 0)
  }
}
