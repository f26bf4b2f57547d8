package graft

import graft.core.Tables

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

  test("w15 funnel semantics: out-of-order steps don't count; each step needs a STRICTLY later first hit") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("funnel_fx").toString
    // testdata layout: events.ts is TIMESTAMP(NANOS) parquet, which the
    // Tables loader reads as int64 nanos and converts — mirror that here
    def ts(m: Int): Long = m * 60_000_000_000L
    // A: clean view->click->purchase. B: purchase & click BEFORE its first
    // view — reaches step1 only. C: view->purchase but no click — the
    // purchase must NOT count without an intervening click. D: click at
    // the SAME instant as view — strictness requires strictly-after.
    spark.createDataFrame(Seq(
      (1L, ts(1), 10L, "view", 0d, "{}"), (2L, ts(2), 10L, "click", 0d, "{}"),
      (3L, ts(3), 10L, "purchase", 0d, "{}"),
      (4L, ts(1), 20L, "purchase", 0d, "{}"), (5L, ts(2), 20L, "click", 0d, "{}"),
      (6L, ts(3), 20L, "view", 0d, "{}"),
      (7L, ts(1), 30L, "view", 0d, "{}"), (8L, ts(2), 30L, "purchase", 0d, "{}"),
      (9L, ts(4), 40L, "view", 0d, "{}"), (10L, ts(4), 40L, "click", 0d, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val rows = SparkEntry.all.find(_.name == "w15_event_funnel").get
      .run(spark, out).collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("users")).toMap
    assert(rows == Map("step1_view" -> 4L, "step2_click" -> 1L, "step3_purchase" -> 1L), rows)
  }

  test("a18 profiler semantics: nulls are counted, not folded into distincts or min/max") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("profile_fx").toString
    spark.createDataFrame(Seq(
      (0L, 5L, "F", 10.5, "2000-01-02 00:00:00", "1-URGENT"),
      (1L, 5L, "O", 20.25, "2000-01-03 00:00:00", "5-LOW")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"),
        // one null per type family: string, double, timestamp
        when(col("o_orderkey") === 0L, lit(null)).otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(col("o_orderkey") === 0L, lit(null)).otherwise(col("o_totalprice")).as("o_totalprice"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val m = SparkEntry.all.find(_.name == "a18_column_profile").get
      .run(spark, out).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("null_count"), r.getAs[Long]("distinct_count"),
          r.getAs[String]("min_value"), r.getAs[String]("max_value")))).toMap
    assert(m("o_orderstatus") == ((1L, 1L, "O", "O")), m)
    assert(m("o_totalprice") == ((1L, 1L, "20.25", "20.25")), m)
    assert(m("o_custkey") == ((0L, 1L, "5", "5")), m)
    assert(m("o_orderdate") == ((0L, 2L, "2000-01-02 00:00:00", "2000-01-03 00:00:00")), m)
  }

  test("a18_column_profile: two scans (distincts + ranges), and the Expand stays on HashAggregate") {
    val plan = executedPlan("a18_column_profile")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected 2 scans (oracle needs 6), got $scans:\n$plan")
    // multi-distinct compiles to the Expand strategy, not N self-joins —
    // and the split design keeps its buffers all-primitive: a string
    // min/max fused into the same aggregate demotes every stage to
    // SortAggregate (5× slower measured at sf0.1)
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Union"), plan)
    assert(plan.contains("HashAggregate"), plan)
    // the ONLY SortAggregates allowed are the grouping-free min/max folds,
    // which sort nothing — so no Sort node may appear anywhere in the plan
    assert(!plan.contains("Sort ["),
      s"a profiling pass got demoted to a sorted aggregate:\n$plan")
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

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf001)

  test("w16_gap_fill: spines are contiguous, gaps carry the last known value, real months match the raw sums") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val out = run("w16_gap_fill").cache()
    // spine contiguity: consecutive rows per customer are 1 month apart
    val w = Window.partitionBy("o_custkey").orderBy("month")
    val gaps = out.withColumn("prev", lag(col("month"), 1).over(w))
      .filter(col("prev").isNotNull &&
        months_between(col("month"), col("prev")) =!= 1.0)
    assert(gaps.count() == 0)
    // forward fill: on gap rows the filled value equals the previous row's
    val bad = out.withColumn("pf", lag(col("filled_total"), 1).over(w))
      .filter(col("is_gap") && col("filled_total") =!= col("pf"))
    assert(bad.count() == 0)
    // non-gap rows: filled == actual, and actuals reconcile with raw orders
    assert(out.filter(!col("is_gap") &&
      col("filled_total") =!= col("month_total")).count() == 0)
    val spineSum = out.agg(sum(col("month_total").cast("decimal(18,2)")))
      .collect()(0).getDecimal(0)
    val rawSum = spark.read.parquet(s"$sf001/orders.parquet")
      .filter(col("o_custkey") % 100 === 0)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(spineSum.compareTo(rawSum) == 0, s"$spineSum != $rawSum")
    out.unpersist()
  }

  test("w17_set_ops: tags partition the union of the year sets") {
    import org.apache.spark.sql.functions._
    val out = run("w17_set_ops").cache()
    // no key appears under two tags
    assert(out.groupBy("o_custkey").count().filter(col("count") > 1)
      .join(out, Seq("o_custkey")).groupBy("o_custkey")
      .agg(countDistinct(col("tag")).as("t")).filter(col("t") > 1).count() == 0)
    // |both| + |only_95| = |active 1995|
    val byTag = out.groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a95 = spark.read.parquet(s"$sf001/orders.parquet")
      .filter(year(col("o_orderdate")) === 1995)
      .select("o_custkey").distinct().count()
    assert(byTag("both") + byTag("only_1995") == a95)
    out.unpersist()
  }

  test("a21_weighted_median: half the weight sits at or below the median, less than half strictly below") {
    import org.apache.spark.sql.functions._
    val med = run("a21_weighted_median").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"),
        col("l_quantity").cast("double").as("q")).cache()
    med.foreach { case (f, (m, tw)) =>
      val below = li.filter(col("l_returnflag") === f && col("v") < m)
        .agg(sum(col("q"))).collect()(0).getDouble(0)
      val atOrBelow = li.filter(col("l_returnflag") === f && col("v") <= m)
        .agg(sum(col("q"))).collect()(0).getDouble(0)
      assert(below * 2 < tw, s"$f: below=$below tw=$tw")
      assert(atOrBelow * 2 >= tw, s"$f: atOrBelow=$atOrBelow tw=$tw")
    }
    li.unpersist()
  }

  test("w18: cumulative distinct equals the expanding-distinct spec; final value = total distinct users") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val out = run("w18_cumulative_distinct").orderBy(col("d")).collect()
    // two-phase ≡ the one global window (stated directly on the fixture)
    val spec = out.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    assert(out.map(_.getLong(3)).sameElements(spec))
    // the last cumulative value is the corpus-wide distinct user count
    // (events.ts is nanos-int64 in raw parquet — go through Tables)
    val events = graft.core.Tables(spark, sf001, "events")
    val total = events.select("user_id").distinct().count()
    assert(out.last.getLong(3) == total)
    // and it truly is "distinct to date": recompute one mid-series day by
    // brute force expanding distinct
    val ev = events.select(col("user_id"), col("ts").cast("date").as("d"))
    val mid = out(out.length / 2)
    val brute = ev.filter(col("d") <= lit(mid.getTimestamp(0).toLocalDateTime.toLocalDate.toString).cast("date"))
      .select("user_id").distinct().count()
    assert(mid.getLong(3) == brute, s"day ${mid.getTimestamp(0)}: ${mid.getLong(3)} vs $brute")
  }

  test("w19: quartiles balance within 1 and rank fractions stay in [0,1]") {
    import org.apache.spark.sql.functions._
    val out = run("w19_distribution_ranks").cache()
    assert(out.filter(col("pr") < 0 || col("pr") > 1 ||
      col("cd") <= 0 || col("cd") > 1).count() == 0)
    // ntile(4) bucket sizes within a segment differ by at most 1
    val spread = out.groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment")
      .agg((max(col("count")) - min(col("count"))).as("spread"),
        countDistinct(col("quartile")).as("nq"))
    assert(spread.filter(col("spread") > 1 || col("nq") =!= 4).count() == 0)
    out.unpersist()
  }

  test("dq1: all expectations pass on the clean fixture and violations are zero") {
    val rows = run("dq1_quality_report").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"check ${r.getString(0)} failed on clean data")
      assert(r.getLong(2) == 0L, r.toString)
    }
  }

  test("a20_chi_square: expected counts reproduce the marginals") {
    import org.apache.spark.sql.functions._
    val out = run("a20_chi_square").cache()
    // sum of expected per row equals the observed row total (within rounding)
    val rows = out.groupBy("prio")
      .agg(sum(col("expected")).as("se"), sum(col("o")).as("so")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getLong(2)) < 1e-3, r.toString)
    }
    assert(out.filter(col("contrib") < 0).count() == 0)
    out.unpersist()
  }
  test("a25: Welch t recomputes from collected balances") {
    import org.apache.spark.sql.functions._
    val r = run("a25_welch_ttest").head
    def grp(seg: String) = Tables(spark, sf001, "customer")
      .filter(col("c_mktsegment") === seg)
      .select(col("c_acctbal").cast("double")).collect().map(_.getDouble(0))
    val (a, b) = (grp("AUTOMOBILE"), grp("BUILDING"))
    def stats(x: Array[Double]) = {
      val n = x.length; val m = x.sum / n
      (n, m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-4)
    assert(math.abs(r.getAs[Double]("var_a") - va) < 1e-2)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-4,
      s"t: engine ${r.getAs[Double]("t_stat")} vs replay $t")
    val dfW = math.pow(va / na + vb / nb, 2) /
      (math.pow(va / na, 2) / (na - 1) + math.pow(vb / nb, 2) / (nb - 1))
    assert(math.abs(r.getAs[Double]("df") - dfW) < 0.5)
    assert(r.getAs[Boolean]("significant") == (math.abs(t) > 1.96))
  }
}
