package graft.ql

import graft.SparkTestBase

class QueryGuardSpec extends SparkTestBase {

  test("valid SELECT executes over registered views with row cap") {
    val res = QueryGuard.execute(spark, sf0001,
      "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey", maxRows = 7)
    assert(res.isRight)
    assert(res.toOption.get.collect().length == 7)
  }

  test("WITH-prefixed query is allowed") {
    val res = QueryGuard.execute(spark, sf0001,
      "WITH x AS (SELECT COUNT(*) AS n FROM nation) SELECT * FROM x")
    assert(res.isRight)
    assert(res.toOption.get.collect().head.getLong(0) == 25L)
  }

  test("DML/DDL statements are denied with the offending keyword") {
    for (bad <- Seq(
      "INSERT INTO orders VALUES (1)",
      "DROP TABLE orders",
      "UPDATE orders SET o_orderstatus = 'X'",
      "CREATE TABLE t AS SELECT 1")) {
      assert(QueryGuard.validate(bad).isLeft, bad)
    }
  }

  test("embedded forbidden keyword in a SELECT is denied") {
    assert(QueryGuard.validate(
      "SELECT 1; DROP TABLE orders").isLeft)
    assert(QueryGuard.validate(
      "SELECT * FROM orders -- drop table orders").isLeft)
    assert(QueryGuard.validate(
      "SELECT /* sneaky */ * FROM orders").isLeft)
  }

  test("forbidden keyword inside a string literal is NOT a false positive") {
    val res = QueryGuard.validate("SELECT 'please drop table x' AS s")
    assert(res.isRight)
  }

  test("trailing semicolon on a single statement is tolerated") {
    assert(QueryGuard.validate("SELECT 1;").isRight)
  }

  test("run returns columns + rows for the shell header") {
    val res = QueryGuard.run(spark, sf0001,
      "SELECT o_orderkey, o_orderstatus FROM orders", maxRows = 5)
    assert(res.isRight)
    val r = res.toOption.get
    assert(r.columns.toSeq == Seq("o_orderkey", "o_orderstatus"))
    assert(r.rows.length == 5)
  }

  test("run times out a long statement with Denied and cancels the job group") {
    import scala.concurrent.duration._
    // quadratic blowup: big enough that 50ms always expires first
    val res = QueryGuard.run(spark, sf001,
      "SELECT COUNT(*) AS n FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey JOIN lineitem c ON b.l_suppkey = c.l_suppkey",
      maxRows = 1, timeout = 50.millis)
    assert(res.isLeft)
    assert(res.swap.toOption.get.reason.contains("timeout"))
    // the session is still healthy afterwards: no leaked hung jobs block it
    val after = QueryGuard.run(spark, sf0001, "SELECT COUNT(*) AS n FROM nation")
    assert(after.isRight)
    assert(after.toOption.get.rows.head.getLong(0) == 25L)
  }

  test("runtime failures surface as Denied, not raw exceptions") {
    val res = QueryGuard.run(spark, sf0001, "SELECT no_such_column FROM orders")
    assert(res.isLeft)
    assert(res.swap.toOption.get.threat == "low")
  }
}
