package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed silver entities (builder brief: `Dataset[T]` with case-class
  * Encoders where type safety helps). The merge keys, enum-ish fields,
  * and derived flags of the hot silver tables get compile-time names and
  * types; the dynamic-schema tables (documents/events payloads) stay
  * DataFrames on purpose.
  */
object Typed {

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderpriority: String)

  final case class OrderSummary(
      o_custkey: Long, orders: Long, open_orders: Long, spend: Double)

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .as[Order]
  }

  /** Typed aggregation: the lambda operates on Order fields with
    * compile-time checking; the plan is still Catalyst-optimized
    * (groupByKey + typed agg compiles to HashAggregate). */
  def summarize(ds: Dataset[Order]): Dataset[OrderSummary] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.o_custkey)
      .mapGroups { (custkey, rows) =>
        var n = 0L; var open = 0L; var spend = 0.0
        rows.foreach { o =>
          n += 1
          if (o.o_orderstatus == "O") open += 1
          spend += o.o_totalprice
        }
        OrderSummary(custkey, n, open, spend)
      }
  }
}
