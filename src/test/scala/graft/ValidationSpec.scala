package graft

import graft.core.Tables

/** A14 row-count validation (reference `validate_etl.py:29-135`): every
  * pipeline table must exist with at least its expected minimum rows —
  * the operational smoke check, engine-side.
  */
class ValidationSpec extends SparkTestBase {

  private val expectedMin: Seq[(String, Long)] = Seq(
    "region" -> 1L, "nation" -> 1L, "customer" -> 1L, "supplier" -> 1L,
    "part" -> 1L, "orders" -> 1L, "lineitem" -> 1L, "events" -> 1L,
    "documents" -> 1L, "embeddings" -> 1L)

  test("every testdata table loads and meets its minimum row count") {
    for ((name, minRows) <- expectedMin) {
      val n = Tables(spark, sf0001, name).count()
      assert(n >= minRows, s"$name has $n rows, expected >= $minRows")
    }
  }

  test("every SparkEntry query has a unique name and runs at sf0.001") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    // entry() is the driver's smoke check - it must return rows
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL exists for every query except the documented rows-only set") {
    val rowsOnly = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // f_custom_functions is the single justified rows-only entry: uuid_v5
    // is SHA-1-based and DuckDB 1.0 has no sha1(); the UDFs are instead
    // pinned to reference vectors in UdfsSpec.
    assert(rowsOnly == Set("f_custom_functions"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
