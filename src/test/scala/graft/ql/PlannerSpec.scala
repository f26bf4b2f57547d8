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
