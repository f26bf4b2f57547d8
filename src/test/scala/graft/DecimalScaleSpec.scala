package graft

import org.apache.spark.sql.catalyst.expressions.{Add, Expression, Multiply, Subtract}
import org.apache.spark.sql.types.DecimalType

/** Inventory-wide detector for the silent decimal-scale truncation that
  * bit this codebase three times (dd67, dd73, ModelStream): with
  * allowPrecisionLoss (the default), decimal +,-,* whose natural result
  * precision exceeds 38 gets its SCALE reduced (9 -> 8 or 6) instead of
  * failing — the engine then quietly computes coarser sums than the
  * DuckDB oracle and the hash gate catches it a round later, if ever.
  *
  * The signature is mechanical: for +,-,* the natural result scale is
  * >= the max child scale, so `result.scale < max(child scales)` IFF
  * Spark dropped precision. This spec walks every query's ANALYZED plan
  * (no execution needed) and fails naming the query and the expression,
  * so the next occurrence dies in `sbt test`, not in a correctness round.
  */
class DecimalScaleSpec extends SparkTestBase {

  private def scaleOf(e: Expression): Option[Int] = e.dataType match {
    case d: DecimalType => Some(d.scale)
    case _ => None
  }

  private def truncated(e: Expression): Boolean = e match {
    case _: Add | _: Subtract | _: Multiply =>
      (scaleOf(e), e.children.flatMap(scaleOf)) match {
        case (Some(rs), cs) if cs.nonEmpty => rs < cs.max
        case _ => false
      }
    case _ => false
  }

  test("no query's plan contains scale-truncating decimal arithmetic") {
    val failures = SparkEntry.all.flatMap { q =>
      try {
        val plan = q.run(spark, sf0001).queryExecution.analyzed
        val bad = scala.collection.mutable.ListBuffer[String]()
        plan.foreach { node =>
          node.expressions.foreach { root =>
            root.foreach { e => if (truncated(e)) bad += e.sql }
          }
        }
        if (bad.nonEmpty) Some(s"${q.name}: ${bad.distinct.take(3).mkString("; ")}")
        else None
      } catch { case ex: Throwable => Some(s"${q.name}: analysis failed ${ex.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the detector actually fires on the known-bad shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((3L, BigDecimal("1.123456789"))).toDF("n", "d")
    val bad1 = df.select((col("n") * col("d").cast("decimal(28,9)")).as("x"))
    val bad2 = df.select((col("d").cast("decimal(28,9)") +
      col("d").cast("decimal(38,9)")).as("x"))
    val good = df.select((col("n").cast("decimal(10,0)") *
      col("d").cast("decimal(18,9)")).as("x"))
    def fires(frame: org.apache.spark.sql.DataFrame): Boolean = {
      var hit = false
      frame.queryExecution.analyzed.foreach(
        _.expressions.foreach(_.foreach(e => if (truncated(e)) hit = true)))
      hit
    }
    assert(fires(bad1), "bigint * decimal(28,9) must be flagged")
    assert(fires(bad2), "decimal(28,9) + decimal(38,9) must be flagged")
    assert(!fires(good), "(10,0) x (18,9) keeps scale 9 and must pass")
  }
}
