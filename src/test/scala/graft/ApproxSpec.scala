package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** SURVEY §7.5: approx_count_distinct as the 100-TB substitute for exact
  * A3 counts where exactness isn't judged — verify the estimate lands
  * within HLL's documented error envelope against the exact answer.
  */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct within 5% of exact on order custkeys") {
    val exact = Tables(spark, sf001, "orders")
      .agg(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val approx = Tables(spark, sf001, "orders")
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("grouped approx counts track exact counts per priority") {
    val exact = Tables(spark, sf001, "orders")
      .groupBy("o_orderpriority").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables(spark, sf001, "orders")
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k exact=$e approx=$a")
    }
  }
}
