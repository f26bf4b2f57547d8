package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TypedSpec extends SparkTestBase {

  test("typed Dataset[Order] round-trips the silver schema with encoders") {
    val ds = Typed.orders(spark, sf0001)
    val first = ds.filter(_.o_orderkey == 0L).head()
    assert(first.o_orderkey == 0L && first.o_orderstatus.nonEmpty)
    assert(ds.count() == 1500)
  }

  test("typed summarize equals the untyped aggregation exactly") {
    val typed = Typed.summarize(Typed.orders(spark, sf0001))
      .toDF().orderBy("o_custkey")
    val untyped = Tables(spark, sf0001, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("orders"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_orders"),
        sum(col("o_totalprice")).as("spend"))
      .orderBy("o_custkey")
    val t = typed.collect(); val u = untyped.collect()
    assert(t.length == u.length)
    t.zip(u).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getLong(2) == b.getLong(2))
      // double sums: typed fold is sequential per group, untyped is
      // partial-agg ordered; compare within float tolerance
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-6)
    }
  }
}
