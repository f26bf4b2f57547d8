package graft

/** Plan-shape pins for the OLAP-surface operators (a16/a17/w12/w13) —
  * correctness is the DuckDB differential gate; these tests pin the
  * SCALE properties the formulations were chosen for, so a refactor that
  * silently de-optimizes them fails CI.
  */
class OlapOpsSpec extends SparkTestBase {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.all.find(_.name == name).get.run(spark, sf0001)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("w12_batch_sessionize: ONE user-keyed exchange feeds both windows and the session rollup") {
    val plan = executedPlan("w12_batch_sessionize")
    // lag window, running-sum window, and the groupBy(user, session) all
    // cluster by user_id — hashpartitioning(user_id) satisfies every one
    // of them, so the whole query must shuffle exactly once.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("a16_rollup: subtotal pyramid is ONE Expand + aggregate, not a union of scans") {
    val plan = executedPlan("a16_rollup")
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Union"), plan)
    // one scan of lineitem only
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("a17_pivot: pinned pivot values keep the cross-tab to a single scan and no driver-side distinct job") {
    val plan = executedPlan("a17_pivot")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("w13_cohort_retention: per-day cohort sizes join broadcast; the event log is scanned once per aggregate tree") {
    val plan = executedPlan("w13_cohort_retention")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("w12 sessionization semantics: a gap of exactly 1800 s does NOT split; 1800.000001 s does") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.createDataFrame(Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      (1L, 3L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00.000001"))))
      .toDF("user_id", "event_id", "ts")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = df.withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double") > 1800d,
          1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess(1L) == 1L && sess(2L) == 1L, s"1800 s gap must not split: $sess")
    assert(sess(3L) == 2L, s"1800.000001 s gap must split: $sess")
  }

  test("a18_column_profile: all six columns' metrics ride ONE scan of orders (oracle needs six)") {
    val plan = executedPlan("a18_column_profile")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    // multi-distinct compiles to the Expand strategy, not N self-joins
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("w15_event_funnel: per-step event_type filters reach the parquet scan; no cartesian anywhere") {
    val plan = executedPlan("w15_event_funnel")
    // each stage reads only its event type — the string filter must be
    // pushed into the scan, not applied post-read over the full log
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(event_type".r.findFirstIn(plan).isDefined,
      s"event_type filter not pushed:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // funnel stages key on user_id: every hash exchange clusters by it
    val funnelExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(funnelExchanges >= 1, s"expected user_id-keyed exchanges:\n$plan")
  }
}
