package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Misra–Gries heavy hitters: the ScalaCheck property pins the
  * theoretical guarantees on the pure kernel (no Spark in the loop);
  * the MemoryStream test pins state survival across micro-batches.
  */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._
  import HeavyHitters._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("MG kernel: undercount bounded by n/(k+1); every > n/(k+1) item survives") {
    val itemGen = Gen.frequency(5 -> "a", 3 -> "b", 2 -> "c", 1 -> "d", 1 -> "e")
    check(Prop.forAll(Gen.listOf(itemGen), Gen.choose(2, 4)) { (stream, k) =>
      val fin = stream.foldLeft(MgState(Map.empty, 0L))((s, it) => mgAdd(s, it, k))
      val n = stream.length.toLong
      val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sizesOk = fin.processed == n && fin.counters.size <= k
      // lower bound: a counter never exceeds its item's true count
      val lbOk = fin.counters.forall { case (it, c) => c <= truth(it) }
      // error bound: undercount is at most n/(k+1) for EVERY item
      val errOk = truth.forall { case (it, t) =>
        t - fin.counters.getOrElse(it, 0L) <= n / (k + 1)
      }
      sizesOk && lbOk && errOk
    })
  }

  test("state survives micro-batches and the dominant type wins") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = HeavyHitters.topTypesPerUser(mem.toDS(), k = 2)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: user 1 sees a,a,b — top is 'a' with lb 2
    mem.addData(TypedEvent(1, "a"), TypedEvent(1, "a"), TypedEvent(1, "b"))
    q.processAllAvailable()
    val b1 = spark.table("hh").collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("processed"),
        r.getAs[String]("top_type"), r.getAs[Long]("top_lb")))
    assert(b1.toSeq.contains((1L, 3L, "a", 2L)))

    // batch 2: +a,+a for user 1 (state 2 carried: lb reaches 4) and a
    // fresh user 2 whose only type is 'x'
    mem.addData(TypedEvent(1, "a"), TypedEvent(1, "a"), TypedEvent(2, "x"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hh").collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("processed"),
        r.getAs[String]("top_type"), r.getAs[Long]("top_lb")))
    assert(rows.contains((1L, 5L, "a", 4L)), rows.mkString(";"))
    assert(rows.contains((2L, 1L, "x", 1L)), rows.mkString(";"))
  }

  test("counter budget respected under adversarial type churn") {
    // 10 distinct types round-robin with k=3: the summary never holds
    // more than 3 counters and processed tracks the full stream
    val stream = (0 until 200).map(i => s"t${i % 10}")
    val fin = stream.foldLeft(MgState(Map.empty, 0L))((s, it) => mgAdd(s, it, 3))
    assert(fin.counters.size <= 3 && fin.processed == 200L)
  }
}
