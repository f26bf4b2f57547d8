package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class FeatRow(x1: Double, x2: Double, y: Double)

/** Online logistic maintainer: after ANY sequence of micro-batches the
  * streamed step-1 coefficients must be BIT-EQUAL to one batch pass over
  * the union — the additive-decimal-sums argument made executable.
  */
class ModelStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def featsOf(rows: Seq[FeatRow]) = rows.toDF()

  private def batchCoefficients(rows: Seq[FeatRow]) = {
    val m = new OnlineLogit(spark,
      java.nio.file.Files.createTempDirectory("graft-logit-batch").toString)
    m.init(); m.applyBatch(featsOf(rows)); m.coefficients
  }

  test("streamed micro-batches ≡ one batch pass, bit-equal coefficients") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-logitstream").toString
    val m = new OnlineLogit(spark, work)
    m.init()

    val b1 = Seq(FeatRow(1.0, 0.5, 1.0), FeatRow(2.0, 0.25, 0.0), FeatRow(1.5, 0.75, 1.0))
    val b2 = Seq(FeatRow(3.0, 0.9, 0.0), FeatRow(0.5, 0.1, 1.0))
    val b3 = Seq(FeatRow(2.5, 0.6, 0.0), FeatRow(1.2, 0.4, 1.0), FeatRow(2.2, 0.3, 0.0))

    val mem = MemoryStream[FeatRow]
    val q = m.start(mem.toDF(), "online_logit")
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    mem.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val streamed = m.coefficients.head
    val batch = batchCoefficients(b1 ++ b2 ++ b3).head
    for (i <- 0 until 3)
      assert(streamed.getDouble(i) == batch.getDouble(i),
        s"coefficient $i: streamed ${streamed.getDouble(i)} vs batch ${batch.getDouble(i)}")
  }

  test("state recovers from the latest committed version") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-logitrecover").toString
    val m = new OnlineLogit(spark, work)
    m.init()
    // 4 affinely-independent rows: a 2-row X'X is singular for 3 features
    m.applyBatch(featsOf(Seq(FeatRow(1.0, 0.5, 1.0), FeatRow(2.0, 0.25, 0.0),
      FeatRow(0.5, 0.9, 1.0), FeatRow(3.0, 0.1, 0.0))))
    val before = m.coefficients.head

    val m2 = new OnlineLogit(spark, work)
    assert(m2.recover() >= 1)
    val after = m2.coefficients.head
    for (i <- 0 until 3) assert(before.getDouble(i) == after.getDouble(i))
  }

  test("init() on a reused workDir fences out a prior run's committed versions") {
    val work = java.nio.file.Files.createTempDirectory("graft-logitfence").toString
    val m = new OnlineLogit(spark, work)
    m.init()
    m.applyBatch(featsOf(Seq(FeatRow(1.0, 0.5, 1.0), FeatRow(2.0, 0.25, 0.0),
      FeatRow(0.5, 0.9, 1.0), FeatRow(3.0, 0.1, 0.0))))
    // a "fresh" model over the same dir: without the fence, recover()
    // takes the max committed version and resurrects the old sums
    val m2 = new OnlineLogit(spark, work)
    m2.init()
    val m3 = new OnlineLogit(spark, work)
    assert(m3.recover() == 0, "recovery must land on the fresh v0, not stale v1")
    val sums = m3.currentSums.head
    for (i <- 0 until 9)
      assert(sums.getDecimal(i).signum == 0, s"sum $i must be zero after re-init")
  }

  test("the streamed step-1 estimator matches dd77's first Newton step on documents") {
    // feed the real documents table in 2 batches; the maintainer's
    // coefficients must equal dd77's own beta1 (recomputed here with the
    // identical frozen-sum recipe in one batch pass)
    val feats = spark.read.parquet(s"$sf001/documents.parquet")
      .select(
        log(size(split(col("text"), " ")).cast("double")).as("x1"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    val m = new OnlineLogit(spark,
      java.nio.file.Files.createTempDirectory("graft-logitdocs").toString)
    m.init()
    m.applyBatch(feats.filter(expr("pmod(hash(x1, x2, y), 2) = 0")))
    m.applyBatch(feats.filter(expr("pmod(hash(x1, x2, y), 2) != 0")))
    val streamed = m.coefficients.head

    val one = new OnlineLogit(spark,
      java.nio.file.Files.createTempDirectory("graft-logitone").toString)
    one.init(); one.applyBatch(feats)
    val batch = one.coefficients.head
    for (i <- 0 until 3) assert(streamed.getDouble(i) == batch.getDouble(i))
  }
}
