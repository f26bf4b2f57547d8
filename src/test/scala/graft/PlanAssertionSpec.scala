package graft

/** Pins the physical-plan shape of scale-critical queries (post-action:
  * with AQE the final plan exists only after execution).
  */
class PlanAssertionSpec extends SparkTestBase {

  test("l7_worth_allocation never windows over a SinglePartition exchange") {
    val df = SparkEntry.all.find(_.name == "l7_worth_allocation").get
      .run(spark, sf0001)
    df.collect() // materialize: AQE finalizes the plan only after an action
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    // the per-order allocation shuffles on the parent key…
    assert(plan.contains("hashpartitioning(l_orderkey"), plan)
    // …and no Sort/Window sits directly on a SinglePartition exchange —
    // the round-2 scale-killer was `sum over ()` compiling to exactly
    // that adjacency. (The 1-row global aggregate's own SinglePartition
    // exchange of per-task partial rows is fine and expected — match the
    // Sort NODE "Sort [", not a SortAggregate partial above the exchange.)
    val badAdjacency = "(?m)Sort \\[[^\\n]*\\n[^\\n]*Exchange SinglePartition".r
    assert(badAdjacency.findFirstIn(plan).isEmpty, plan)
  }

  test("NO query in the inventory ships a cartesian product or a single-partition window") {
    // engine-wide scale audit (the reference's query_optimizer.py plan
    // checks, engine-side): every query's EXECUTED plan is scanned for
    // the two antipatterns that silently stop scaling — a cartesian
    // product, and a Sort/Window funneling the data through one
    // partition. Justified exceptions are listed explicitly.
    // (global ORDER BY + LIMIT queries like w4/w7 compile to
    // TakeOrderedAndProject, so no exception list is needed)
    val singlePartitionOk = Set.empty[String]
    // "Sort [" is the Sort exec node; a SortAggregate PARTIAL feeding a
    // 1-row global exchange (a18's grouping-free min/max fold) is fine.
    val badAdjacency = "(?m)Sort \\[[^\\n]*\\n[^\\n]*Exchange SinglePartition".r
    val failures = SparkEntry.all.flatMap { q =>
      try {
        val df = q.run(spark, sf0001)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val sp = !singlePartitionOk(q.name) && badAdjacency.findFirstIn(plan).isDefined
        if (cart || sp)
          Some(s"${q.name}: cartesian=$cart singlePartitionWindow=$sp")
        else None
      } catch { case e: Throwable => Some(s"${q.name}: failed ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("a21_weighted_median never sorts the raw fact inside the flag window") {
    // the round-8 two-phase rewrite's contract: every Window in the
    // executed plan runs over an AGGREGATED relation (per-value or
    // per-bucket weights), never over raw lineitem — reverting to the
    // naive cumulative-RANGE plan puts a Window directly on the fact
    // scan (parallelism capped at 3 flags) and fails this pin.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val df = SparkEntry.all.find(_.name == "a21_weighted_median").get
      .run(spark, sf0001)
    df.collect()
    val windows = Explain.flatten(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "two-phase median must window the bucket relations")
    windows.foreach { w =>
      val aggBelow = Explain.flatten(w.child)
        .exists(_.isInstanceOf[BaseAggregateExec])
      assert(aggBelow,
        s"Window sits directly on the fact table:\n$w")
    }
  }

  test("e2_blocked_fuzzy joins only broadcast relations and windows on the query key") {
    // the round-8 rewrite's contract: all candidate-generation relations
    // are entity-bounded broadcasts (distinct names, name pairs, per-name
    // extremal keys) — a shuffle join here means row-level pair fan-out
    // is back; the single window partitions by query_key, whose partition
    // count GROWS with data instead of being capped by the vocabulary.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec, BroadcastHashJoinExec}
    val df = SparkEntry.all.find(_.name == "e2_blocked_fuzzy").get
      .run(spark, sf0001)
    df.collect()
    val nodes = Explain.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(n => n.isInstanceOf[SortMergeJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec]),
      "candidate relations must broadcast — a shuffle join re-fans-out rows")
    assert(nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 3,
      "name pairs, candidate stats, and min1 all join as broadcasts")
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty &&
      windows.forall(_.partitionSpec.exists(_.toString.contains("query_key"))),
      "top-1 window must partition by query_key")
  }

  test("j13_asof_join compiles to a window pass, not a join") {
    // the point of the union+running-window formulation: the executed
    // plan must contain NO join operator of any kind — an inequality
    // as-of join would be quadratic per user key at scale.
    val df = SparkEntry.all.find(_.name == "j13_asof_join").get.run(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("mv_firs_full child aggregates shuffle on the parent key, dims broadcast") {
    val df = SparkEntry.all.find(_.name == "mv_firs_full").get.run(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    // hierarchy + sub-lookup dims must come in as broadcasts, and no
    // child aggregate may funnel through a single partition
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // ALL FOUR child roles are fused onto ONE lineitem scan + one
    // parent-key shuffle (per-order rollups run in array-land on the
    // collected children). FormattedMode prints exactly one Location
    // line per scan node.
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val liScans = "Location: [^\\n]*lineitem\\.parquet".r.findAllIn(formatted).length
    assert(liScans == 1, s"expected 1 fused lineitem scan, got $liScans")
  }

  test("n4_spec_fanout at 24-child breadth still reads the parent exactly once") {
    val q = SparkEntry.all.find(_.name == "n4_spec_fanout").get
    // 24 children in the spec list (reference breadth, ir_etl.py:918-1491)
    assert(q.doc.contains("24 child tables"), q.doc)
    val df = q.run(spark, sf0001)
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the packed-array explode keeps the groupBy subtree (and the scan)
    // single no matter how many children the spec list fans out
    val liScans = "Location: [^\\n]*lineitem\\.parquet".r.findAllIn(formatted).length
    assert(liScans == 1, s"expected exactly 1 lineitem scan, got $liScans")
    // one shuffle total — count only the Final Plan section (the AQE
    // printout repeats the tree under Initial Plan with fresh node ids)
    val finalSection = formatted.split("== Initial Plan ==").head
    val shuffles = "Exchange \\(\\d+\\)".r.findAllIn(finalSection).length
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles\n$formatted")
  }

  test("dd114/dd116 consume their corpus-lineage derived tables through the cache") {
    // the round-11 10x canary's fix: prefs (dd114) and shingleArr/mh
    // (dd116) are small tables whose LINEAGE is a corpus-sized join or
    // 8-way minhash — un-cached, each of their 2-5 consumers re-ran that
    // upstream (22.3x / 29.1x at 10x; 4.5x / 4.4x cached). This pins the
    // cache in the executed plan so a refactor cannot silently drop it.
    Seq("dd114_pref_transitivity", "dd116_incremental_lsh").foreach { n =>
      spark.catalog.clearCache()
      val df = SparkEntry.all.find(_.name == n).get.run(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"$n lost its derived-table cache:\n${plan.take(1500)}")
    }
    spark.catalog.clearCache()
  }
}
