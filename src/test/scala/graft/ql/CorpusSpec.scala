package graft.ql

import graft.SparkTestBase

/** Analog of the reference's 371-question corpus (`chatbot/questions.txt`
  * + `test_runner.py`): every question must plan into guard-clean SQL
  * that executes and returns rows. The planner is rule-based (the LLM
  * generator is external); this pins the engine-side contract: planned
  * SQL is always valid, safe, and answerable. Categories mirror
  * questions.txt: counts, global + grouped aggregations, grouped counts,
  * lists, top-N, top-k-per-group, superlatives ("which X has the most"),
  * search, date ranges, status filters, negations, FK joins, and
  * multi-constraint compositions (date + status + join + group-by).
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
    "count click events",
    "count purchase events",
    "count view events",
    "how many orders were placed in 2001",
    "count orders before 1996",
    "how many line items shipped since 2000",
    "count chinese documents",
    "how many pending orders are there",
    "count signup events",
    "how many error events happened",
    "count german documents")

  private val globalAggs = Seq(
    "total value of all orders",
    "sum of line item prices",
    "average order value",
    "total event value in 2024",
    "sum of customer balances",
    "total supplier account balance",
    "average line item value",
    "total order value since 1997",
    "sum of order totals before 2000",
    "average event value",
    "total part retail value",
    "sum of document sizes")

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
    "spend by nation",
    "total revenue by nation",
    "sum of balances by segment",
    "total line item value by supplier",
    "average spend by brand")

  private val groupedCounts = Seq(
    "how many orders per status",
    "count orders by priority",
    "how many customers per segment",
    "count documents by language",
    "how many documents per source",
    "count events by event type",
    "how many orders per year",
    "count line items by supplier",
    "how many orders per customer",
    "count orders by nation",
    "how many line items per brand",
    "count customers in each segment",
    "how many orders in each status",
    "count documents for each language")

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

  private val topKByMetric = Seq(
    "top 3 customers by total order value",
    "top 5 customers by order value",
    "top 10 customers by purchase history value",
    "top 3 nations by order value",
    "top 5 suppliers by shipment value",
    "top 3 parts by shipment value",
    "top 5 suppliers by account balance",
    "top 10 parts by retail price",
    "top 5 customers by balance",
    "top 3 documents by length")

  private val topKPerGroup = Seq(
    "top 3 customers per nation",
    "top 2 orders per customer",
    "top 5 parts per brand",
    "top 3 orders per priority",
    "top 2 orders per status",
    "top 3 customers per segment",
    "top 2 events per event type",
    "top 3 documents per language",
    "top 2 documents per source",
    "top 3 orders per year",
    "top 2 line items per supplier",
    "top 3 line items per year",
    "top 5 orders in each priority",
    "top 2 customers for each segment")

  private val whichGroup = Seq(
    "which nation has the most customers",
    "which nation has the most orders",
    "which customer has the most orders",
    "which segment has the most customers",
    "which priority has the most orders",
    "which status has the most orders",
    "which language has the most documents",
    "which source has the fewest documents",
    "which event type has the most events",
    "which supplier has the most line items",
    "which brand has the most parts",
    "which nation has the highest total order value",
    "which segment has the highest customer balance",
    "which priority has the lowest total order value")

  private val superlatives = Seq(
    "show the most expensive parts",
    "list the cheapest parts",
    "show the largest orders",
    "show the highest value orders",
    "list the smallest orders",
    "show the newest orders",
    "list the oldest orders",
    "show the latest events",
    "list the earliest events",
    "show the most recent line items",
    "list the biggest line items",
    "show customers with the highest balance",
    "list the most valuable customers",
    "show the priciest parts",
    "list suppliers with the lowest balance",
    "show the greatest orders")

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
    "search for documents about data",
    "find parts named rod",
    "find documents about merge",
    "find documents containing filter",
    "find documents about window",
    "find documents containing customer")

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
    "show orders between 1996 and 1998",
    "list orders in 1995",
    "show orders in 2001",
    "orders since 2000",
    "line items since 2000",
    "show events before 2025",
    "list line items after 1998",
    "orders after 1995",
    "show line items from 1997 to 1999")

  /** Day-precision phrasings — the reference corpus's date-based
    * category verbatim shapes (questions.txt 6-10): dd-mm-yyyy BETWEEN,
    * single day, onwards, month name, last-N-days (pinned anchor). */
  private val dayRanges = Seq(
    "find all orders registered between 01-02-1995 and 28-02-1995",
    "show orders registered in february 1995",
    "list orders from the last 30 days",
    "show orders from the last 90 days",
    "find orders registered on 19-06-1995",
    "show orders from 11-05-2000 onwards",
    "list line items shipped between 01-01-1997 and 31-03-1997",
    "line items shipped on 06-11-1997",
    "show line items shipped in september 1996",
    "count orders between 01-06-1996 and 30-06-1996",
    "how many orders were placed in march 1997",
    "count line items shipped in the last 90 days",
    "count open orders in june 1995",
    "total value of orders in december 1996",
    "count urgent orders from 01-01-1998 onwards")

  /** Explicit ordering phrasings (questions.txt #3 "first 10 crimes
    * ordered by FIR date"). */
  private val orderedLists = Seq(
    "show the first 10 orders ordered by date",
    "list the first 20 line items ordered by ship date",
    "show line items sorted by value descending",
    "list orders sorted by value",
    "show the first 15 customers ordered by name",
    "list suppliers ordered by name",
    "show events ordered by time",
    "first 5 orders ordered by date descending")

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
    "show french documents",
    "list view events",
    "show german documents",
    "list spanish documents",
    "show chinese documents")

  private val negations = Seq(
    "list orders that are not finished",
    "show orders not open",
    "count orders that are not pending",
    "list non-urgent orders",
    "show orders excluding high priority ones",
    "count line items not returned",
    "list line items that were not returned",
    "show events excluding click events",
    "count events that are not error events",
    "list documents that are not english",
    "show documents not in french",
    "count non-english documents",
    "list events without signup events",
    "show orders that are not urgent",
    "count documents excluding spanish documents",
    "list orders except finished orders")

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

  /** Date + status + join + group-by compositions in one question — the
    * multi-constraint category the reference corpus leans on. */
  private val multiConstraint = Seq(
    "total value by nation for open orders since 1996",
    "total value by nation since 1996",
    "sum of order value by priority in 1997",
    "average order value by status before 2000",
    "total revenue by year for finished orders",
    "order totals by customer since 1997",
    "total spend by supplier in 1996",
    "line item value by brand since 1998",
    "event value by event type in 2024",
    "count open orders since 1996",
    "count returned items before 1999",
    "how many urgent orders in 1997",
    "count finished orders by year",
    "how many open orders per priority",
    "list open orders with customer names in 1996",
    "show finished orders with customer details since 1997",
    "list returned items with part details in 1996",
    "show urgent orders with nations before 1999",
    "list pending orders with customers from 1996 to 1998",
    "top 3 open orders per priority",
    "top 2 finished orders per customer since 1996",
    "top 3 orders per year for open orders",
    "which nation has the most open orders",
    "which priority has the most orders since 1997",
    "which customer has the most orders in 1996",
    "count orders that are not finished since 1996",
    "list non-urgent orders in 1997",
    "show orders not open with customer names",
    "count line items not returned since 1997",
    "show the newest open orders",
    "list the largest orders since 1998",
    "show the oldest orders with customer names",
    "customers with orders in 1996",
    "customers with orders before 1997",
    "count pending orders in 1996",
    "total value by status since 1997")

  /** AVG/MIN/MAX metric selection, global and grouped, with filters. */
  private val metricAggs = Seq(
    "average order value by nation",
    "average customer balance by segment",
    "average line item value by brand",
    "average event value by event type",
    "average document size by language",
    "maximum order value by status",
    "maximum order value by year",
    "max event value by event type",
    "minimum order value by priority",
    "minimum customer balance by segment",
    "max line item value by supplier",
    "average order value since 1997",
    "maximum order value in 1996",
    "minimum order value before 2000",
    "average value of open orders",
    "maximum value of finished orders",
    "maximum supplier balance",
    "minimum part price",
    "average part price",
    "maximum document size",
    "average event value in 2024",
    "minimum line item value",
    "mean order value",
    "average order value for urgent orders",
    "maximum order value by nation",
    "average spend by customer",
    "maximum order value by priority for open orders",
    "average order value by nation since 1996")

  /** Numeric threshold filters over the table's numeric column. */
  private val thresholds = Seq(
    "list orders over 100000",
    "show orders above 400000",
    "count orders under 50000",
    "orders worth more than 250000",
    "how many orders exceed 300000",
    "list orders below 10000",
    "customers with balance above 5000",
    "show customers with balance below 0",
    "count customers with balance above 9000",
    "suppliers with balance above 3000",
    "list suppliers with balance under 2000",
    "line items over 50000",
    "show line items under 10000",
    "count line items above 90000",
    "parts over 910",
    "list parts under 910",
    "events with value over 100",
    "show events with value under 50",
    "count events with value above 200",
    "documents over 300",
    "list documents under 200",
    "count documents above 400",
    "list open orders over 200000",
    "count finished orders above 100000",
    "show urgent orders over 300000",
    "orders over 100000 in 1996",
    "list orders above 200000 since 1997",
    "count orders under 100000 before 2000",
    "show orders over 250000 with customer names",
    "top 5 orders over 300000",
    "count returned items over 50000",
    "list click events with value over 100")

  /** Distinct-entity cardinality counts. */
  private val distinctCounts = Seq(
    "how many different brands are there",
    "how many unique segments",
    "count distinct priorities",
    "how many different statuses",
    "how many unique languages",
    "how many different sources",
    "how many unique event types",
    "how many different customers placed orders",
    "how many unique suppliers",
    "how many different nations do customers come from",
    "count the distinct customers",
    "how many unique parts were ordered",
    "count unique documents",
    "how many distinct events")

  /** Extra phrasings across the established categories. */
  private val morePhrasings = Seq(
    // counts
    "how many events occurred in 2024",
    "count orders from 1996 to 1998",
    "how many line items in 1999",
    "how many customers do we have",
    "count parts",
    "how many documents are there",
    "count nations",
    "how many suppliers are there",
    // global aggs
    "total line item value",
    "sum of event values",
    "total value of orders in 1997",
    "sum of part prices",
    "total document size",
    // grouped aggs
    "revenue by supplier",
    "total spend by brand",
    "order value by status",
    "event totals by event type",
    "document sizes by source",
    "total balance by segment",
    // lists
    "show recent events",
    "list all suppliers",
    "display customer records",
    "show me the orders",
    "list parts please",
    "display the documents",
    // top-N
    "top 4 customers",
    "first 8 orders",
    "top 12 parts",
    "first 2 nations",
    "top 6 events",
    "top 15 documents",
    // searches
    "find documents about table",
    "find documents containing stream",
    "find documents about query",
    "find documents containing batch",
    "find the supplier called supplier",
    "find documents about sort",
    "find documents containing scan",
    "find parts called widget please",
    // date ranges
    "orders from 1996 to 2000",
    "line items in 1995",
    "show orders before 1997",
    "events since 2023",
    "orders between 1995 and 1999",
    "line items between 1996 and 1997",
    // status filters
    "show purchase events",
    "display open orders",
    "all finished orders",
    "show pending orders today",
    "list urgent orders now",
    // joins
    "orders and customers",
    "parts with line items",
    "suppliers with line items",
    "nations with customers",
    "orders with their customers",
    // negations
    "count orders not urgent",
    "list documents not german",
    "show line items that were not returned",
    "list orders that are not high priority",
    "show documents excluding chinese documents",
    // multi-constraint
    "top 2 orders per status since 1997",
    "which segment has the most customers with balance above 0",
    "count open orders over 100000 since 1996",
    "average value of finished orders by nation",
    // events/documents phrasings twinned with the r6 oracle gates
    "how many click events in january 2024",
    "how many events are not click",
    "average value by event type",
    "how many purchase events over 400",
    "top 5 events by value",
    "how many unique sources are there",
    "how many events on 15-01-2024",
    "find documents about dup",
    "first 10 events ordered by time",
    // month dimension + share/percentage intents (r6)
    "count of orders by month in 1996",
    "average order value by month in 1997",
    "how many line items per month",
    "top 2 orders per month",
    "share of customers by segment",
    "share of revenue by nation",
    "what percentage of orders are open",
    "share of documents by language",
    "proportion of orders by priority",
    "what percentage of line items are returned",
    // avg-count-per-entity, date-extremum, two-dim grouping (r6)
    "average number of orders per customer",
    "average number of events per user",
    "average items per order",
    "average number of line items per supplier",
    "average documents per source",
    "average number of orders per year",
    "what is the earliest order date",
    "what is the latest shipment date",
    "when was the latest event",
    "when was the first event",
    "count of orders by status and year",
    "count of documents by language and source",
    "count of events by event type and month",
    "count of orders by priority and year",
    "total order value by status and year",
    // HAVING + numeric BETWEEN (r6)
    "which segments have more than 25 customers",
    "which nations have more than 5 customers",
    "which languages have more than 10 documents",
    "which sources have fewer than 50 documents",
    "how many orders between 50000 and 150000",
    "list events with value between 100 and 200",
    "count line items between 2000 and 60000")

  /** Statistical metrics (median / percentile / stddev), plain, grouped,
    * and composed with filters. */
  private val statMetrics = Seq(
    "what is the median order value",
    "median account balance",
    "median event value by event type",
    "median order value by priority",
    "90th percentile of order value",
    "95th percentile of event values",
    "75th percentile of order value by status",
    "25th percentile of account balance",
    "standard deviation of order value",
    "standard deviation of account balance by segment",
    "stddev of event values",
    "standard deviation of order value in 1996",
    "median order value in 1997",
    "90th percentile of order value by year",
    // derived day dimension
    "count of events by day",
    "events per day",
    "count of click events by day",
    "average event value by day",
    "total order value by day",
    "average number of events per day",
    "how many different days have events",
    "how many unique months have orders",
    "which year has the most orders",
    "which day has the most events",
    "which months have more than 10 orders",
    "which days have more than 5 events")

  /** Round-6 widening: more phrasings per existing category, including
    * the time-dim which-group/having paths and stat metrics over joins. */
  private val moreCoverage = Seq(
    "how many orders were placed since 1998",
    "count view events in 2024",
    "how many english documents are there",
    "count orders in february 1996",
    "average account balance",
    "minimum order value",
    "maximum event value",
    "total revenue in 1998",
    "total event value by day",
    "average document size by source",
    "total order value by month in 1997",
    "count orders by month",
    "count events by day in 2024",
    "count orders per priority in 1996",
    "show the most recent orders first",
    "list click events",
    "top 2 suppliers by total shipment value",
    "top 4 customers per segment",
    "which month has the most events",
    "which day has the most clicks",
    "which segment has the lowest customer balance",
    "median line item value",
    "median event value in 2024",
    "75th percentile of order value by nation",
    "standard deviation of document sizes by language",
    "which priorities have more than 50 orders",
    "which event types have more than 100 events",
    "count documents that are not english",
    "how many events are not clicks",
    "count orders worth more than 200000",
    "how many events with value over 400",
    "customers with balance below 0",
    "orders with customer names in 1996",
    "median order value by year",
    "25th percentile of event values by event type",
    "how many unique days have clicks",
    "which nations have fewer than 80 customers",
    "total order value by day in 1996")

  private val corpus: Seq[String] =
    counts ++ globalAggs ++ groupedAggs ++ groupedCounts ++ lists ++ topN ++
      topKByMetric ++ topKPerGroup ++ whichGroup ++ superlatives ++
      searches ++ dateRanges ++ dayRanges ++ orderedLists ++
      statusFilters ++ negations ++ combos ++ joins ++ joinCombos ++
      multiConstraint ++ metricAggs ++ thresholds ++ distinctCounts ++
      morePhrasings ++ statMetrics ++ moreCoverage

  test("corpus has at least 371 questions (the reference contract size) with no duplicates") {
    assert(corpus.size >= 371, s"corpus has ${corpus.size} questions")
    assert(corpus.distinct.size == corpus.size, "duplicate questions in the corpus")
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

  test("'after YYYY' is exclusive, 'since YYYY' inclusive") {
    assert(Planner.plan("orders placed after 1997").yearRange.contains((1998, 9999)))
    assert(Planner.plan("orders since 1997").yearRange.contains((1997, 9999)))
    val rows = QueryGuard.execute(spark, sf0001,
      Planner.plan("list orders after 1997").sql, maxRows = 100).toOption.get
      .selectExpr("year(o_orderdate) AS y").collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(0) >= 1998))
  }

  test("status questions actually filter: only the requested status comes back") {
    val p = Planner.plan("list open orders")
    assert(p.statusFilter.contains("o_orderstatus = 'O'"))
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 100).toOption.get
      .select("o_orderstatus").distinct().collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("O"))
  }

  test("negated status questions exclude exactly the negated status") {
    val p = Planner.plan("list orders that are not finished")
    assert(p.negated && p.statusFilter.contains("NOT (o_orderstatus = 'F')"))
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 1000).toOption.get
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).toSet
    assert(rows.nonEmpty && !rows.contains("F"))
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

  test("grouped count questions return one row per group") {
    val p = Planner.plan("how many orders per status")
    assert(p.intent == "count" && p.groupDim.contains("status"))
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 100).toOption.get.collect()
    assert(rows.length == 3) // O, F, P
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("top-k-per-group keeps at most k rows per group, ranked by the numeric column") {
    val p = Planner.plan("top 3 customers per nation")
    assert(p.intent == "topk_group" && p.groupDim.contains("nation"))
    val df = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 1000).toOption.get
    val perGroup = df.groupBy("n_name").count().collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) <= 3))
    // within one group the balances are in descending order
    val one = df.filter(df("n_name") === perGroup.head.getString(0))
      .selectExpr("c_acctbal", "rnk").collect().sortBy(_.getInt(1))
    assert(one.map(_.getDouble(0)).sliding(2).forall(p2 => p2.length < 2 || p2(0) >= p2(1)))
  }

  test("top-k-by-metric ranks entities by the summed fact value") {
    val p = Planner.plan("top 3 customers by total order value")
    assert(p.intent == "topk_by" && p.needsAggregation && p.joined == Seq("orders"))
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 10).toOption.get.collect()
    assert(rows.length == 3)
    val expected = QueryGuard.execute(spark, sf0001,
      "SELECT c_custkey, SUM(o_totalprice) AS total FROM orders " +
        "JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_custkey ORDER BY total DESC, c_custkey LIMIT 3",
      maxRows = 10).toOption.get.collect()
    assert(rows.map(_.get(0)).sameElements(expected.map(_.get(0))))
  }

  test("top-k-by with an own-column metric orders directly, no aggregation") {
    val p = Planner.plan("top 5 suppliers by account balance")
    assert(p.intent == "topk_by" && !p.needsAggregation)
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 10).toOption.get.collect()
    assert(rows.length == 5)
    val bals = rows.map(_.getAs[Double]("s_acctbal"))
    assert(bals.sliding(2).forall(p2 => p2.length < 2 || p2(0) >= p2(1)))
  }

  test("'which X has the most Y' returns exactly the top group") {
    val p = Planner.plan("which nation has the most customers")
    assert(p.intent == "which_group" && p.limit == 1)
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 10).toOption.get.collect()
    assert(rows.length == 1)
    // cross-check against a direct grouped count
    val expected = QueryGuard.execute(spark, sf0001,
      "SELECT n_name, COUNT(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n DESC, n_name LIMIT 1", maxRows = 10)
      .toOption.get.collect()
    assert(rows.head.getString(0) == expected.head.getString(0))
  }

  test("superlative questions order by the numeric column") {
    val p = Planner.plan("show the most expensive parts")
    assert(p.orderBy.exists(_.startsWith("p_retailprice DESC")))
    val prices = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 20).toOption.get
      .select("p_retailprice").collect().map(_.getDouble(0))
    assert(prices.nonEmpty && prices.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("metric questions select the right aggregate: average is an AVG, not a SUM") {
    val p = Planner.plan("average order value")
    assert(p.sql.contains("AVG(o_totalprice) AS avg_value"), p.sql)
    val avg = QueryGuard.execute(spark, sf0001, p.sql).toOption.get
      .collect().head.getDouble(1)
    val expected = QueryGuard.execute(spark, sf0001,
      "SELECT AVG(o_totalprice) AS a FROM orders").toOption.get.collect().head.getDouble(0)
    assert(avg == expected)
    assert(Planner.plan("maximum order value by status").sql.contains("MAX(o_totalprice) AS max_value"))
    assert(Planner.plan("minimum part price").sql.contains("MIN(p_retailprice) AS min_value"))
  }

  test("threshold questions actually filter on the numeric column") {
    val p = Planner.plan("list orders over 100000")
    assert(p.sql.contains("o_totalprice > 100000"), p.sql)
    val rows = QueryGuard.execute(spark, sf0001, p.sql, maxRows = 1000).toOption.get
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(rows.nonEmpty && rows.forall(_ > 100000))
    val pu = Planner.plan("show customers with balance below 0")
    assert(pu.sql.contains("c_acctbal < 0"), pu.sql)
    val bal = QueryGuard.execute(spark, sf0001, pu.sql, maxRows = 1000).toOption.get
      .select("c_acctbal").collect().map(_.getDouble(0))
    assert(bal.nonEmpty && bal.forall(_ < 0))
  }

  test("distinct-count questions return the true cardinality") {
    val p = Planner.plan("how many different brands are there")
    assert(p.sql.contains("COUNT(DISTINCT p_brand)"), p.sql)
    val n = QueryGuard.execute(spark, sf0001, p.sql).toOption.get.collect().head.getLong(0)
    val expected = QueryGuard.execute(spark, sf0001,
      "SELECT COUNT(DISTINCT p_brand) AS n FROM part").toOption.get.collect().head.getLong(0)
    assert(n == expected && n > 1)
  }

  test("a recognized year range that cannot resolve a date column is surfaced, not dropped") {
    val p = Planner.plan("list customers since 1996") // customer has no date column
    assert(p.yearRange.contains((1996, 9999)) && !p.yearApplied)
    // and with a joined table that has one, it IS applied
    val pj = Planner.plan("customers with orders since 1998")
    assert(pj.yearApplied && pj.sql.contains("year(o_orderdate) BETWEEN 1998 AND 9999"))
  }
}
