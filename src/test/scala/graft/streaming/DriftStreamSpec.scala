package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class ValueRow(value: Double)

/** Streaming PSI monitor: after any sequence of micro-batches, the
  * running histogram must equal one batch pass over the union, and the
  * PSI must match a direct recomputation with the dd53 smoothing.
  */
class DriftStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("micro-batched drift state ≡ batch histogram; PSI matches direct recompute") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-driftstream").toString

    // reference: values uniform over low buckets
    val reference = Seq.tabulate(200)(i => ValueRow((i % 100).toDouble)).toDF()
    val m = new DriftMonitor(spark, work, bucketWidth = 50.0, nBuckets = 10)
    m.init(reference, "value")
    assert(m.psi() == 0.0 || m.psi() > 0, "psi defined on empty window")

    val mem = MemoryStream[ValueRow]
    val q = m.start(mem.toDF(), "value", "drift_monitor")

    val b1 = Seq(10.0, 60.0, 110.0, 470.0, 480.0)
    val b2 = Seq(490.0, 495.0, 499.0, 20.0)
    val b3 = Seq(250.0, 250.0, 260.0)
    mem.addData(b1.map(ValueRow): _*); q.processAllAvailable()
    mem.addData(b2.map(ValueRow): _*); q.processAllAvailable()
    mem.addData(b3.map(ValueRow): _*); q.processAllAvailable()
    q.stop()

    // histogram conservation: streamed state == one batch pass over union
    val all = b1 ++ b2 ++ b3
    val expectedHist = all.map(ValueRow).toDF()
      .select(least(floor(col("value") / 50.0), lit(9)).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    assert(sameRows(m.currentHistogram, expectedHist),
      s"hist:\n${m.currentHistogram.collect().mkString("\n")}")

    // PSI against a direct Scala recompute (Laplace +1/k, k=10)
    def bucket(v: Double) = math.min((v / 50.0).toInt, 9)
    val refCounts = Array.tabulate(10)(b =>
      Seq.tabulate(200)(i => (i % 100).toDouble).count(bucket(_) == b).toLong)
    val curCounts = Array.tabulate(10)(b => all.count(bucket(_) == b).toLong)
    val (refT, curT) = (refCounts.sum, curCounts.sum)
    val expectedPsi = (0 until 10).map { b =>
      // only buckets PRESENT in either side's state contribute (the
      // monitor's full-outer join sees no row for never-seen buckets)
      if (refCounts(b) == 0 && curCounts(b) == 0) 0.0
      else {
        val rp = (refCounts(b) + 1.0) / (refT + 10)
        val cp = (curCounts(b) + 1.0) / (curT + 10)
        val term = (cp - rp) * math.log(cp / rp)
        math.rint(term * 1e9) / 1e9
      }
    }.sum
    assert(math.abs(m.psi() - expectedPsi) < 1e-7,
      s"psi=${m.psi()} expected=$expectedPsi")
    // drift direction sanity: current mass sits in high buckets the
    // reference never occupies, so PSI must be clearly positive
    assert(m.psi() > 0.5, s"expected strong drift, got ${m.psi()}")
  }
}
