package graft.ql

import graft.SparkTestBase

/** Analog of the reference's 371-question corpus (`chatbot/questions.txt`
  * + `test_runner.py`): every question must plan into guard-clean SQL
  * that executes and returns rows. The planner is rule-based (the LLM
  * generator is external); this pins the engine-side contract: planned
  * SQL is always valid, safe, and answerable. Categories mirror
  * questions.txt: counts, global + grouped aggregations, lists, top-N,
  * search, date ranges, status filters, FK joins, and combinations.
  */
class CorpusSpec extends SparkTestBase {

  private val counts = Seq(
    "How many orders were placed?",
    "how many customers are there",
    "count the documents in the corpus",
    "How many nations exist?",
    "count events",
    "How many suppliers do we have?",
    "count line items",
    "how many parts are in the catalog",
    "how many orders were placed in 1996",
    "count orders since 1999",
    "how many line items shipped before 1998",
    "count open orders",
    "how many urgent orders are there",
    "count click events")

  private val globalAggs = Seq(
    "total value of all orders",
    "sum of line item prices",
    "average order value",
    "total event value in 2024",
    "sum of customer balances",
    "total supplier account balance")

  private val groupedAggs = Seq(
    "total value by nation",
    "sum of purchases by customer",
    "average order by priority",
    "total revenue by status",
    "order totals by year",
    "customer balances by segment",
    "total spend by supplier",
    "line item value by brand",
    "event value by event type",
    "document sizes by language",
    "documents by source",
    "total order value by customer",
    "average value by priority",
    "sales by year",
    "total value by event type",
    "spend by nation")

  private val lists = Seq(
    "list recent orders",
    "show the customer list",
    "list the documents",
    "show events",
    "list suppliers",
    "show all parts",
    "list nations",
    "show line items",
    "list customers please",
    "show orders")

  private val topN = Seq(
    "top 5 suppliers",
    "first 10 parts",
    "top 3 nations",
    "top 20 orders",
    "first 5 customers",
    "top 7 documents",
    "first 3 events",
    "top 10 line items")

  private val searches = Seq(
    "find customers named customer",
    "find suppliers named supplier",
    "find nations called nation",
    "find parts called widget",
    "find parts named bolt",
    "find documents about spark",
    "find documents containing join",
    "search orders",
    "find the part called gizmo",
    "search for documents about data")

  private val dateRanges = Seq(
    "list orders in 1996",
    "show orders placed in 2000",
    "list orders from 1995 to 1997",
    "orders before 1998",
    "show orders since 1999",
    "list line items in 1997",
    "line items shipped from 1996 to 1999",
    "show events in 2024",
    "list events since 2024",
    "orders placed after 1997",
    "line items before 2000",
    "show orders between 1996 and 1998")

  private val statusFilters = Seq(
    "list open orders",
    "show finished orders",
    "list pending orders",
    "show urgent orders",
    "list high priority orders",
    "show low priority orders",
    "list returned items",
    "show click events",
    "list error events",
    "show signup events",
    "list english documents",
    "show french documents")

  private val combos = Seq(
    "list open orders in 1996",
    "show returned items since 1997",
    "count finished orders before 2000",
    "list click events in 2024")

  private val joins = Seq(
    "orders with customer names",
    "list orders with customer details",
    "show customers with their nations",
    "line items with part details",
    "list line items with supplier info",
    "show suppliers with their nations",
    "list orders with nations",
    "line items with order details",
    "show line items with parts",
    "customers and their nations")

  private val joinCombos = Seq(
    "list open orders with customer names",
    "show urgent orders with customer details",
    "line items with parts in 1996",
    "returned items with supplier details",
    "orders with customers since 1998",
    "finished orders with customer info")

  private val corpus: Seq[String] =
    counts ++ globalAggs ++ groupedAggs ++ lists ++ topN ++ searches ++
      dateRanges ++ statusFilters ++ combos ++ joins ++ joinCombos

  test("corpus has at least 100 questions") {
    assert(corpus.size >= 100, s"corpus has ${corpus.size} questions")
  }

  test("every corpus question plans, validates, executes, and returns rows") {
    val failures = corpus.flatMap { q =>
      val plan = Planner.plan(q)
      QueryGuard.execute(spark, sf0001, plan.sql, maxRows = plan.limit) match {
        case Left(denied) => Some(s"'$q' -> DENIED ${denied.reason} (${plan.sql})")
        case Right(df) =>
          val n = df.count()
          if (n > 0) None else Some(s"'$q' -> 0 rows (${plan.sql})")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("count questions return a single-row count; limit questions respect the cap") {
    val countDf = QueryGuard.execute(spark, sf0001,
      Planner.plan("how many orders").sql).toOption.get
    assert(countDf.count() == 1)
    val p = Planner.plan("top 5 suppliers")
    assert(p.limit == 5)
    val capped = QueryGuard.execute(spark, sf0001, p.sql, maxRows = p.limit).toOption.get
    assert(capped.count() <= 5)
  }

  test("date-range questions actually filter: every returned year is in range") {
    val p = Planner.plan("list orders from 1995 to 1997")
    assert(p.yearRange.contains((1995, 1997)))
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 100).toOption.get
      .selectExpr("year(o_orderdate) AS y").collect()
    assert(rows.nonEmpty && rows.forall(r => r.getInt(0) >= 1995 && r.getInt(0) <= 1997))
  }

  test("status questions actually filter: only the requested status comes back") {
    val p = Planner.plan("list open orders")
    assert(p.statusFilter.contains("o_orderstatus = 'O'"))
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 100).toOption.get
      .select("o_orderstatus").distinct().collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("O"))
  }

  test("join questions produce joined columns from both tables") {
    val p = Planner.plan("orders with customer names")
    assert(p.joined.nonEmpty) // primary table is keyword-ranked; join is symmetric
    val df = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 10).toOption.get
    assert(df.columns.contains("o_orderkey") && df.columns.contains("c_name"))
    assert(df.count() > 0)
  }

  test("grouped aggregation questions return one row per group with totals") {
    val p = Planner.plan("total value by nation")
    assert(p.groupDim.contains("nation") && p.needsAggregation)
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 100).toOption.get.collect()
    assert(rows.length > 1, "expected multiple nation groups")
    assert(rows.forall(r => !r.isNullAt(1) && r.getLong(1) > 0))
  }
}
