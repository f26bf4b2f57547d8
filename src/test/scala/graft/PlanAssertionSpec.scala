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
    // exchange of per-task partial rows is fine and expected.)
    val badAdjacency = "(?m)Sort[^\\n]*\\n[^\\n]*Exchange SinglePartition".r
    assert(badAdjacency.findFirstIn(plan).isEmpty, plan)
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
  }
}
