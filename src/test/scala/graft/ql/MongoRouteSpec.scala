package graft.ql

import graft.SparkTestBase

/** NL → Mongo routing: which plans route, the JSON they compile to, and
  * end-to-end parity with the SQL surface on the sf0.001 corpus (the
  * driver-gated qlm_nl_parity row re-proves this at sf0.01/0.1).
  */
class MongoRouteSpec extends SparkTestBase {

  test("listing/filter/count intents route; joins, groups, thresholds, day-ranges stay on SQL") {
    assert(MongoRoute.fromQuestion("show open orders from 1995 to 1996").isDefined)
    assert(MongoRoute.fromQuestion("how many open orders").isDefined)
    assert(MongoRoute.fromQuestion("how many english documents").isDefined)
    assert(MongoRoute.fromQuestion("find documents containing vector").isDefined)
    assert(MongoRoute.fromQuestion("how many orders are not finished").isDefined)
    // round-11: plain-column grouped counts route through the compiled
    // $group; function dims (year()) still refuse
    assert(MongoRoute.fromQuestion("count of orders by priority").isDefined)
    assert(MongoRoute.fromQuestion("count of orders by year").isEmpty)
    // not routable: day-precision range, numeric threshold, joined
    // tables, metric aggregate
    assert(MongoRoute.fromQuestion(
      "how many orders between 01-02-1995 and 15-02-1995").isEmpty)
    assert(MongoRoute.fromQuestion("orders over 100000").isEmpty)
    assert(MongoRoute.fromQuestion("average order value").isEmpty)
  }

  test("routed JSON shape: status equality, $ne negation, year range as timestamp bounds") {
    val open = MongoRoute.fromQuestion("how many open orders").get
    assert(open.collection == "orders" && open.kind == "aggregate")
    assert(open.filterJson == """{"o_orderstatus": "O"}""")
    val neg = MongoRoute.fromQuestion("how many orders are not finished").get
    assert(neg.filterJson == """{"o_orderstatus": {"$ne": "F"}}""")
    val listed = MongoRoute.fromQuestion("show open orders from 1995 to 1996").get
    assert(listed.filterJson ==
      """{"o_orderstatus": "O", "o_orderdate": {"$gte": "1995-01-01", "$lt": "1997-01-01"}}""")
    assert(listed.pipelineJson.contains(""""$sort": {"o_orderkey": 1}"""))
    assert(listed.pipelineJson.contains(""""$limit": 100"""))
    val search = MongoRoute.fromQuestion("find documents containing vector").get
    assert(search.filterJson == """{"text": {"$regex": "(?i)vector"}}""")
    val grouped = MongoRoute.fromQuestion("count of orders by priority").get
    assert(grouped.pipelineJson.contains(""""$group": {"_id": "$o_orderpriority", "n": {"$sum": 1}}"""))
    assert(grouped.renameIdTo.contains("grp"))
  }

  test("routed answers equal the SQL surface's rows on sf0.001") {
    val questions = Seq(
      "show open orders from 1995 to 1996",
      "how many open orders",
      "how many english documents",
      "find documents containing vector",
      "how many orders are not finished",
      "count of orders by priority")
    questions.foreach { q =>
      val r = MongoRoute.fromQuestion(q).getOrElse(fail(s"'$q' did not route"))
      val sqlRows = QueryGuard.execute(spark, sf0001, Planner.plan(q).sql,
          maxRows = 1000000)
        .fold(d => fail(d.reason), identity)
        .collect().map(_.toString).sorted.toSeq
      val mongoRows = MongoRoute.run(spark, sf0001, r)
        .fold(d => fail(d.toString), identity)
        .collect().map(_.toString).sorted.toSeq
      assert(sqlRows == mongoRows, s"surfaces diverged for '$q'")
    }
  }
}
