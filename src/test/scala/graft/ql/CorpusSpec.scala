package graft.ql

import graft.SparkTestBase

/** Mini analog of the reference's 371-question corpus
  * (`chatbot/questions.txt` + `test_runner.py`): every question must plan
  * into guard-clean SQL that executes and returns rows. The planner is
  * rule-based (the LLM generator is external); this pins the engine-side
  * contract: planned SQL is always valid, safe, and answerable.
  */
class CorpusSpec extends SparkTestBase {

  private val corpus = Seq(
    "How many orders were placed?",
    "how many customers are there",
    "count the documents in the corpus",
    "How many nations exist?",
    "count events",
    "How many suppliers do we have?",
    "count line items",
    "how many parts are in the catalog",
    "total value by nation",
    "sum of purchases by customer",
    "average order by priority",
    "list recent orders",
    "show the customer list",
    "list the documents",
    "show events",
    "top 5 suppliers",
    "first 10 parts",
    "top 3 nations",
    "find the customer named Smith",
    "search orders",
    "find documents about tables",
    "show supplier activity",
    "list click events",
    "recent purchase history")

  test("every corpus question plans, validates, executes, and returns rows") {
    val failures = corpus.flatMap { q =>
      val plan = Planner.plan(q)
      QueryGuard.execute(spark, sf0001, plan.sql, maxRows = plan.limit) match {
        case Left(denied) => Some(s"'$q' -> DENIED ${denied.reason} (${plan.sql})")
        case Right(df) =>
          val n = df.count()
          if (n > 0) None else Some(s"'$q' -> 0 rows (${plan.sql})")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("count questions return a single-row count; limit questions respect the cap") {
    val countDf = QueryGuard.execute(spark, sf0001,
      Planner.plan("how many orders").sql).toOption.get
    assert(countDf.count() == 1)
    val p = Planner.plan("top 5 suppliers")
    assert(p.limit == 5)
    val capped = QueryGuard.execute(spark, sf0001, p.sql, maxRows = p.limit).toOption.get
    assert(capped.count() <= 5)
  }
}
