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

  // Schema-drift canary: the round-5 testdata regeneration silently changed
  // events.ts from int64-nanos to timestamp[us] and zeroed 32 queries. This
  // test pins every table's POST-LOAD logical schema (what queries actually
  // see through Tables.apply) so the next drift fails ONE named test with a
  // message naming the drifted column and type, not a fleet of queries.
  private val expectedSchema: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    // o_orderdate / l_shipdate stay TIMESTAMP_NTZ as the parquet delivers
    // them (year()/comparisons/pass-through are NTZ-safe and r5 proved the
    // oracle compare green); events.ts is normalized to LTZ because
    // event-time functions (unix_micros, window()) require it.
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts must normalize to TimestampType no matter how the parquet encodes
    // it (int64-nanos under nanosAsLong, or native timestamp[us]).
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("schema canary: every table's post-load schema matches the pin") {
    for ((name, expected) <- expectedSchema.toSeq.sortBy(_._1)) {
      val actual = Tables(spark, sf0001, name).schema
        .map(f => f.name -> f.dataType.simpleString)
      assert(actual == expected,
        s"SCHEMA DRIFT in '$name': got $actual, pinned $expected — " +
        "testdata was regenerated with a different schema; fix " +
        "core/Tables.scala normalization or re-pin here.")
    }
  }

  test("every SparkEntry query has a unique name and runs at sf0.001") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    // entry() is the driver's smoke check - it must return rows
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registerAll survives one broken table: other nine views still resolve") {
    // Synthetic broken dir: real copies of 9 tables + a corrupt events
    // .parquet. registerAll must register the good nine, throw for events,
    // and leave lastDir unset so a later call retries from scratch.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-broken").toString
    for (t <- Tables.all if t != "events")
      Files.copy(Paths.get(s"$sf0001/$t.parquet"),
        Paths.get(s"$dir/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.write(Paths.get(s"$dir/events.parquet"),
      "not a parquet file".getBytes)

    intercept[Throwable] { Tables.registerAll(spark, dir) }
    // The nine healthy views must resolve even though events failed.
    for (t <- Tables.all if t != "events")
      assert(spark.table(t).count() > 0, s"view $t did not survive")

    // Restore: force re-registration of the canonical views regardless of
    // what lastDir held before this test (order-independent cleanup).
    Tables.registerAll(spark, sf001)
    Tables.registerAll(spark, sf0001)
  }

  // st_dedup_watermark's oracle (aggregates over the CLEAN events table)
  // equals the deduped redelivery stream only while event_id is unique: if
  // a fixture revision ever reused event_ids with differing payloads,
  // dropDuplicates would pick an arbitrary row and the gate would break
  // nondeterministically. Pin the precondition here so a fixture change
  // fails THIS named test, not the streaming gate.
  test("events fixture precondition: event_id is unique (st_dedup_watermark oracle contract)") {
    import org.apache.spark.sql.functions.{count, countDistinct, lit}
    for (dir <- Seq(sf0001, sf001)) {
      val r = Tables(spark, dir, "events")
        .agg(count(lit(1)).as("n"), countDistinct("event_id").as("d"))
        .head()
      assert(r.getLong(0) == r.getLong(1),
        s"events.event_id not unique at $dir (${r.getLong(0)} rows, " +
        s"${r.getLong(1)} distinct) — st_dedup_watermark's clean-table " +
        "oracle is only valid under uniqueness")
    }
  }

  test("oracle SQL exists for every query except the documented rows-only set") {
    val rowsOnly = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // EMPTY since r9: f_custom_functions — the last rows-only entry —
    // is oracle-gated via independently-precomputed constants (CPython
    // uuid.uuid5 / difflib) plus a DuckDB restatement of trigram
    // similarity; dd57_cms_calibration left this set in r8. Any query
    // added without an oracle must be justified here.
    assert(rowsOnly == Set.empty[String],
      s"unexpected rows-only queries: $rowsOnly")
  }
}
