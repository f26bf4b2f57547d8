package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class FunnelEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Streaming funnel maintenance: after ANY sequence of micro-batches —
  * including out-of-order arrivals that a running-state update could
  * not handle — the maintained per-user funnel table must equal the
  * batch cascade over the full accumulated log.
  */
class FunnelStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("micro-batched funnel state ≡ batch cascade, incl. late events that re-qualify steps") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-funnelstream").toString

    // seed: user 1 has view@5; user 2 has click@1 only (no row: no view)
    val seed = Seq(FunnelEv(1L, t(5), "view"), FunnelEv(2L, t(1), "click")).toDF()
    val m = new FunnelMaintainer(spark, work)
    m.init(seed)
    assert(m.funnel.collect().map(_.getLong(0)).toSet == Set(1L))

    val mem = MemoryStream[FunnelEv]
    val q = m.start(mem.toDF(), "funnel_maintain")

    // batch 1: user 1 clicks@7 (qualifies: after view@5); user 2 views@3
    // — the seed click@1 is BEFORE it, so user 2 still has t2 = null
    mem.addData(FunnelEv(1L, t(7), "click"), FunnelEv(2L, t(3), "view"))
    q.processAllAvailable()
    val after1 = m.funnel.collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(after1(1L) == ((Some(t(7)), None)), after1)
    assert(after1(2L) == ((None, None)), after1)

    // batch 2: a LATE view@2 for user 1 arrives — earlier than view@5.
    // t1 moves to 2:00, and the click@7 stays qualified. User 2 gets a
    // click@4 (after its view@3) and a purchase@6 (after the click).
    mem.addData(FunnelEv(1L, t(2), "view"), FunnelEv(2L, t(4), "click"), FunnelEv(2L, t(6), "purchase"))
    q.processAllAvailable()
    q.stop()

    val byUser = m.funnel.collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))).toMap
    assert(byUser(1L) == ((t(2), t(7), null)), byUser)
    assert(byUser(2L) == ((t(3), t(4), t(6))), byUser)

    // the invariant: maintained state == batch cascade over the full log
    assert(sameRows(m.funnel, m.cascade(m.eventLog)))
  }
}
