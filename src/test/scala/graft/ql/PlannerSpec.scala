package graft.ql

import graft.SparkTestBase
import graft.core.Tables

class PlannerSpec extends SparkTestBase {

  test("intent detection follows the priority rules") {
    assert(Planner.detectIntent("How many orders were placed?") == "count")
    assert(Planner.detectIntent("total value by nation") == "aggregate")
    assert(Planner.detectIntent("find the customer named X") == "search")
    assert(Planner.detectIntent("show recent documents") == "list")
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
