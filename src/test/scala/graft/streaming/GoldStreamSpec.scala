package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

case class LiDelta(l_orderkey: Long, l_quantity: Double)

/** Streaming incremental MV maintenance: micro-batches of fact deltas
  * splice changed parents into the gold table; after any sequence of
  * batches the maintained gold must equal a full rebuild over the final
  * fact state — the invariant that makes the streaming path safe at
  * 100 TB (O(touched parents) per batch, no full refresh ever).
  */
class GoldStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def buildGold(fact: DataFrame): DataFrame =
    fact.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("li_count"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty_tot"))

  test("foreachBatch micro-batches maintain gold ≡ full rebuild over the final fact state") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-goldstream").toString
    val fact0 = Tables(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_quantity"))

    val m = new GoldMaintainer(spark, "l_orderkey", work, buildGold)
    m.init(fact0)
    assert(sameRows(m.gold, buildGold(fact0)))

    val mem = MemoryStream[LiDelta]
    val q = m.start(mem.toDF(), "gold_maintain")

    // batch 1: %51 parents get their child set REPLACED (doubled qty,
    // one extra child row per parent)
    val touched1 = fact0.filter(col("l_orderkey") % 51 === 0)
    val b1 = touched1.select(col("l_orderkey"), (col("l_quantity") * 2).as("l_quantity"))
      .unionByName(touched1.groupBy("l_orderkey").agg(lit(7.0).as("l_quantity")))
      .as[LiDelta].collect()
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()

    // batch 2: a different (overlapping) parent set shrinks to ONE child
    val b2 = fact0.filter(col("l_orderkey") % 57 === 0)
      .groupBy("l_orderkey").agg(lit(1.5).as("l_quantity"))
      .as[LiDelta].collect()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    // expected final fact: child-replace semantics applied batch by batch
    val k1 = touched1.select("l_orderkey").distinct()
    val afterB1 = fact0.join(k1, Seq("l_orderkey"), "left_anti")
      .unionByName(b1.toIndexedSeq.toDF("l_orderkey", "l_quantity"))
    val k2 = b2.toIndexedSeq.toDF("l_orderkey", "l_quantity").select("l_orderkey").distinct()
    val finalFact = afterB1.join(k2, Seq("l_orderkey"), "left_anti")
      .unionByName(b2.toIndexedSeq.toDF("l_orderkey", "l_quantity"))

    assert(sameRows(m.fact, finalFact))
    assert(sameRows(m.gold, buildGold(finalFact)))
    // the %57 parents really did shrink to one child of qty 1.5
    val shrunk = m.gold.filter(col("l_orderkey") % 57 === 0).collect()
    assert(shrunk.nonEmpty &&
      shrunk.forall(r => r.getLong(1) == 1L && r.getDouble(2) == 1.5))
  }

  test("listener progress and maintainer metrics agree on rows processed") {
    // A13 ≅ StreamingQueryListener (SURVEY §2.11): a REAL listener's
    // progress events and the maintainer's own per-batch metrics must
    // count the same rows; st_metrics_parity oracle-gates the maintainer
    // side, this test ties it to the live listener surface.
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-goldmetrics").toString
    val fact0 = Tables(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_quantity"))

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name == "gold_metrics" && e.progress.numInputRows > 0)
          seen.add(e.progress.numInputRows)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val m = new GoldMaintainer(spark, "l_orderkey", work, buildGold,
        trackMetrics = true)
      m.init(fact0)
      val mem = MemoryStream[LiDelta]
      val q = m.start(mem.toDF(), "gold_metrics")
      val b1 = fact0.filter(col("l_orderkey") % 51 === 0)
        .as[LiDelta].collect()
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      val b2 = fact0.filter(col("l_orderkey") % 57 === 0)
        .groupBy("l_orderkey").agg(lit(1.5).as("l_quantity"))
        .as[LiDelta].collect()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      // give the async listener bus a beat to drain
      spark.streams.awaitAnyTermination(1)
      val metric = m.metrics.filter(col("batch_id") > 0)
        .orderBy("batch_id").collect()
      assert(metric.map(_.getAs[Long]("rows_in")).toSeq ==
        Seq(b1.length.toLong, b2.length.toLong))
      // listener saw the same per-batch input rows (order-insensitive:
      // the bus is async)
      val eventually = (1 to 50).exists { _ =>
        if (seen.size >= 2) true else { Thread.sleep(100); false }
      }
      assert(eventually, s"listener saw only ${seen.size} progress events")
      val fromListener = seen.toArray(Array.empty[java.lang.Long])
        .map(_.toLong).toSeq.sorted
      assert(fromListener == Seq(b1.length.toLong, b2.length.toLong).sorted,
        s"listener rows $fromListener != batches ${Seq(b1.length, b2.length)}")
      // state sizes in the metrics match the maintained tables
      assert(metric.last.getAs[Long]("state_rows") == m.fact.count())
      assert(metric.last.getAs[Long]("gold_rows") == m.gold.count())
    } finally spark.streams.removeListener(listener)
  }
}
