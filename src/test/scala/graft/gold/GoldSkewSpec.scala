package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.GoldMvFull

/** Round-10 skew guard for the gold MV collect path: a mega-parent (1
  * parent with ~10⁵ children — the reference's plausible skew case,
  * SURVEY §4) must assemble through the TWO-PHASE SALTED cap instead of
  * funnelling every child struct into one collect_list task.
  */
class GoldSkewSpec extends SparkTestBase {

  private def syntheticFrames(megaChildren: Int) = {
    val spark2 = spark
    import spark2.implicits._
    // two parents: a mega-parent (id 1) and a normal one (id 2), with
    // FKs resolving against the real sf0.001 dims
    val orders = Seq(
      (1L, 1L, "O", "1-URGENT", "1995-03-15"),
      (2L, 2L, "F", "3-MEDIUM", "1994-07-01"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp_ntz")).drop("d")
    val mega = spark.range(1, megaChildren + 1L).select(
      lit(1L).as("l_orderkey"),
      col("id").cast("int").as("l_linenumber"),
      (col("id") % 200 + 1).as("l_partkey"),
      (col("id") % 10 + 1).as("l_suppkey"),
      when(col("id") % 3 === 0, "R").when(col("id") % 3 === 1, "A")
        .otherwise("N").as("l_returnflag"),
      when(col("id") % 2 === 0, "F").otherwise("O").as("l_linestatus"),
      (col("id") % 50).cast("double").as("l_quantity"))
    val normal = spark.range(1, 4).select(
      lit(2L).as("l_orderkey"),
      col("id").cast("int").as("l_linenumber"),
      col("id").as("l_partkey"),
      col("id").as("l_suppkey"),
      lit("R").as("l_returnflag"),
      lit("F").as("l_linestatus"),
      lit(7.0).as("l_quantity"))
    (orders, mega.unionByName(normal))
  }

  test("capped build bounds a 100k-child mega-parent and counts the overflow") {
    val cap = 4
    val (orders, li) = syntheticFrames(100000)
    val capped = GoldMvFull.buildFirsFull(spark, sf0001, orders, li,
      childCap = cap)

    // plan pin: the capped assembly must be the two-phase salted groupBy —
    // an exchange keyed on (l_orderkey, salt) precedes the per-parent merge
    val plan = capped.queryExecution.sparkPlan.toString
    assert(plan.contains("salt"),
      s"capped plan lost the salted phase-1 groupBy:\n$plan")

    val rows = capped.orderBy("id").collect()
    assert(rows.length == 2)
    val megaRow = rows(0)
    assert(megaRow.getAs[Long]("n_accused") == cap.toLong,
      "mega-parent details must be capped")
    assert(megaRow.getAs[Long]("n_children_total") == 100000L)
    assert(megaRow.getAs[Long]("n_children_overflow") == 100000L - cap)
    // the kept children are the CANONICALLY smallest: linenumbers 1..cap
    // (linenumber is the leading sort key and unique here)
    val details = megaRow.getAs[String]("accused_details")
    for (ln <- 1 to cap)
      assert(details.contains(s""""personCode":"L-$ln""""), details)
    assert(!details.contains(s""""personCode":"L-${cap + 1}""""), details)
    // a sub-cap parent is untouched and reports zero overflow
    val normalRow = rows(1)
    assert(normalRow.getAs[Long]("n_accused") == 3L)
    assert(normalRow.getAs[Long]("n_children_total") == 3L)
    assert(normalRow.getAs[Long]("n_children_overflow") == 0L)
  }

  test("uncapped and capped builds agree wherever no parent exceeds the cap") {
    // on a corpus with fan-in <= cap the guard must be a no-op on every
    // shared column (the capped variant only ADDS the total/overflow pair)
    val (orders, li) = syntheticFrames(4)
    val capped = GoldMvFull.buildFirsFull(spark, sf0001, orders, li,
      childCap = 4).drop("n_children_total", "n_children_overflow")
    val full = GoldMvFull.buildFirsFull(spark, sf0001, orders, li)
    assert(sameRows(capped, full))
  }
}
