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
}
