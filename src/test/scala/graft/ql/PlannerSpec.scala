package graft.ql

import graft.SparkTestBase
import graft.core.Tables

class PlannerSpec extends SparkTestBase {

  test("intent detection follows the priority rules") {
    assert(Planner.detectIntent("How many orders were placed?") == "count")
    assert(Planner.detectIntent("total value by nation") == "aggregate")
    assert(Planner.detectIntent("find the customer named X") == "search")
    assert(Planner.detectIntent("show recent documents") == "list")
    // "account balance" must not substring-match the count cue
    assert(Planner.detectIntent("minimum account balance of customers") == "aggregate")
    assert(Planner.detectIntent("count of accounts") == "count")
  }

  test("table matcher picks the most specific keyword hit") {
    assert(Planner.matchTable("how many orders") == "orders")
    assert(Planner.matchTable("customer purchase history") == "orders") // longer kw wins
    assert(Planner.matchTable("documents in the corpus") == "documents")
    assert(Planner.matchTable("something unrelated") == "orders") // default
  }

  test("limit extraction: top-N phrasing, default 100") {
    assert(Planner.extractLimit("top 7 suppliers") == 7)
    assert(Planner.extractLimit("first 25 parts") == 25)
    assert(Planner.extractLimit("all events") == 100)
  }

  test("day-precision date ranges: between/on/onwards/month-name/last-N-days") {
    assert(Planner.extractDateRange("orders between 01-02-1995 and 15-02-1995")
      .contains(("1995-02-01", "1995-02-15")))
    assert(Planner.extractDateRange("orders registered on 27-03-1996")
      .contains(("1996-03-27", "1996-03-27")))
    assert(Planner.extractDateRange("orders from 11-05-1997 onwards")
      .contains(("1997-05-11", "9999-12-31")))
    assert(Planner.extractDateRange("orders in february 1996")
      .contains(("1996-02-01", "1996-02-29"))) // leap year end-of-month
    assert(Planner.extractDateRange("orders from the last 30 days")
      .contains(("2001-07-02", "2001-08-01"))) // pinned end-of-data anchor
    // ISO literals accepted too
    assert(Planner.extractDateRange("orders between 1995-02-01 and 1995-02-15")
      .contains(("1995-02-01", "1995-02-15")))
    // no day-level phrasing → None (year extraction handles these)
    assert(Planner.extractDateRange("orders since 1997").isEmpty)
    assert(Planner.extractDateRange("orders from 1995 to 1997").isEmpty)
  }

  test("day-precision range wins over the year extractor and lands in the SQL") {
    val p = Planner.plan("count orders between 01-02-1995 and 15-02-1995")
    assert(p.sql.contains("CAST(o_orderdate AS DATE) BETWEEN DATE '1995-02-01' AND DATE '1995-02-15'"),
      p.sql)
    assert(p.yearRange.isEmpty) // the years inside the literals must NOT widen the filter
    assert(p.yearApplied)
    // a day range on a dateless table surfaces as applied=false, not silence
    val q = Planner.plan("count customers registered on 27-03-1996")
    assert(!q.yearApplied, q.sql)
  }

  test("explicit ordered-by phrasing lands a deterministic ORDER BY") {
    val p = Planner.plan("show the first 10 orders ordered by date")
    assert(p.sql.contains("ORDER BY o_orderdate ASC, o_orderkey"), p.sql)
    assert(p.limit == 10)
    val q = Planner.plan("list line items sorted by value descending")
    assert(q.sql.contains("ORDER BY l_extendedprice DESC, l_orderkey"), q.sql)
    val r = Planner.plan("list customers ordered by name")
    assert(r.sql.contains("ORDER BY c_name ASC, c_custkey"), r.sql)
    // unknown target falls through to the deterministic key order,
    // never to an ORDER BY on the unresolvable word
    val t0 = Planner.plan("list orders ordered by priority")
    assert(t0.sql.contains("ORDER BY o_orderkey"), t0.sql)
    assert(!t0.sql.contains("priority DESC") && !t0.sql.contains("priority ASC"), t0.sql)
    // "ordered by" must not hijack table matching via the substring
    // "order": "events ordered by time" is an events question
    val e0 = Planner.plan("first 10 events ordered by time")
    assert(e0.table == "events", e0.sql)
    assert(e0.sql.contains("ORDER BY ts ASC, event_id"), e0.sql)
  }

  test("month dimension derives from the table's date column") {
    val p = Planner.plan("count of orders by month in 1996")
    assert(p.sql.contains("date_format(o_orderdate, 'yyyy-MM')"), p.sql)
    assert(p.sql.contains("year(o_orderdate) BETWEEN 1996 AND 1996"), p.sql)
    val e = Planner.plan("count of events by month")
    assert(e.sql.contains("date_format(ts, 'yyyy-MM')"), e.sql)
  }

  test("share intent: grouped shares divide by a scalar-subquery grand total") {
    val p = Planner.plan("share of revenue by nation")
    assert(p.intent == "share", p.sql)
    assert(p.sql.contains("SUM(o_totalprice) / (SELECT SUM(o_totalprice)"), p.sql)
    val c = Planner.plan("share of customers by segment")
    assert(c.sql.contains("COUNT(*) / (SELECT COUNT(*)"), c.sql)
  }

  test("filtered percentage keeps the predicate out of the WHERE") {
    val p = Planner.plan("what percentage of orders are open")
    assert(p.intent == "share", p.sql)
    assert(p.sql.contains("CASE WHEN o_orderstatus = 'O'"), p.sql)
    assert(!p.sql.toLowerCase.contains("where"), p.sql)
  }

  test("avg-per-entity plans a two-level aggregate on the FK key, never a join") {
    val p = Planner.plan("average number of orders per customer")
    assert(p.intent == "avg_per_entity", p.sql)
    assert(p.sql.contains("GROUP BY o_custkey"), p.sql)
    assert(!p.sql.toLowerCase.contains("join"), p.sql)
    // bare phrasing with a whitelisted entity noun
    val i = Planner.plan("average items per order")
    assert(i.intent == "avg_per_entity" && i.sql.contains("GROUP BY l_orderkey"), i.sql)
    // per-year falls back to the derived time key
    val y = Planner.plan("average number of orders per year")
    assert(y.sql.contains("GROUP BY year(o_orderdate)"), y.sql)
    // a value phrasing must NOT land here — it's a grouped AVG
    val v = Planner.plan("average order value per customer")
    assert(v.intent != "avg_per_entity", v.sql)
    // a filter phrase rides into the inner scan
    val c = Planner.plan("average number of clicks per user")
    assert(c.sql.contains("event_type = 'click'") && c.sql.contains("GROUP BY user_id"), c.sql)
  }

  test("date-extremum questions compile to MIN/MAX over the date column") {
    val p = Planner.plan("what is the earliest order date")
    assert(p.intent == "date_metric" && p.sql == "SELECT MIN(o_orderdate) AS earliest FROM orders", p.sql)
    val q = Planner.plan("when was the latest event")
    assert(q.sql == "SELECT MAX(ts) AS latest FROM events", q.sql)
    // a superlative LIST phrasing keeps its ORDER BY treatment
    val l = Planner.plan("show the 10 newest orders")
    assert(l.intent != "date_metric" && l.sql.contains("ORDER BY o_orderdate DESC"), l.sql)
    // a dateless table cannot answer a date-extremum question
    assert(Planner.plan("what is the earliest customer date").intent != "date_metric")
  }

  test("two-dim grouping widens the GROUP BY on one fact scan") {
    val p = Planner.plan("count of orders by status and year")
    assert(p.sql.contains("o_orderstatus AS grp1") &&
      p.sql.contains("year(o_orderdate) AS grp2"), p.sql)
    assert(p.groupDim.contains("status+year"), p.groupDim.toString)
    val d = Planner.plan("count of documents by language and source")
    assert(d.sql.contains("lang AS grp1") && d.sql.contains("source AS grp2"), d.sql)
    val a = Planner.plan("total order value by status and year")
    assert(a.sql.contains("SUM(o_totalprice) AS total") && a.sql.contains("GROUP BY"), a.sql)
    // dims on DIFFERENT facts must not pair — single-dim fallback
    val x = Planner.plan("count of orders by status and language")
    assert(x.groupDim.contains("status"), x.sql)
  }

  test("HAVING intent filters the aggregate, never the rows") {
    val p = Planner.plan("which segments have more than 300 customers")
    assert(p.intent == "having", p.sql)
    assert(p.sql.contains("HAVING COUNT(*) > 300"), p.sql)
    assert(!p.sql.contains("WHERE"), p.sql) // the numeral must NOT leak into a row filter
    val n = Planner.plan("which nations have fewer than 6 customers")
    assert(n.sql.contains("JOIN nation") && n.sql.contains("HAVING COUNT(*) < 6"), n.sql)
    // composes with a status filter in the WHERE
    val c = Planner.plan("which priorities have more than 100 open orders")
    assert(c.sql.contains("WHERE o_orderstatus = 'O'") &&
      c.sql.contains("HAVING COUNT(*) > 100"), c.sql)
  }

  test("numeric BETWEEN binds to the value column; year pairs stay a date range") {
    val p = Planner.plan("how many orders between 50000 and 150000")
    assert(p.sql.contains("o_totalprice BETWEEN 50000 AND 150000"), p.sql)
    assert(p.yearRange.isEmpty, p.sql)
    val y = Planner.plan("how many orders between 1995 and 1999")
    assert(y.yearRange.contains((1995, 1999)), y.sql)
    assert(y.sql.contains("year(o_orderdate) BETWEEN 1995 AND 1999"), y.sql)
    val e = Planner.plan("count events with value between 100 and 200")
    assert(e.sql.contains("value BETWEEN 100 AND 200"), e.sql)
  }

  test("generated SQL for a count intent runs through the guard end-to-end") {
    val p = Planner.plan("how many nations are there")
    assert(p.intent == "count" && p.table == "nation")
    val res = QueryGuard.execute(spark, sf0001, p.sql)
    assert(res.isRight)
    assert(res.toOption.get.collect().head.getLong(0) == 25L)
  }

  test("schema cache memoizes and serves column/type pairs") {
    Tables.registerAll(spark, sf0001)
    Planner.clearSchemaCache()
    val s1 = Planner.schemaOf(spark, "nation")
    assert(s1.map(_._1) == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(Planner.schemaOf(spark, "nation") eq s1) // same memoized instance
  }
}
