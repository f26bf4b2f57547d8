package graft.ql

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.core.Tables

/** Property fuzz over the planner's question space: any composition of
  * intent prefix + status words + entity + constraint suffixes must plan
  * into SQL that (a) passes QueryGuard.validate and (b) analyzes against
  * the registered views — no execution. This guards corpus growth: new
  * feature extractors cannot emit invalid or unsafe SQL for any phrasing
  * combination, including nonsensical ones.
  */
class PlannerFuzzSpec extends SparkTestBase {

  private val prefixes = Gen.oneOf(
    "list", "show", "count", "how many", "find", "total value of",
    "average", "sum of", "top 4", "first 6", "show the largest",
    "list the newest", "show the cheapest", "which nation has the most",
    "which status has the most", "which segment has the highest",
    // r6 intents + adversarial magnitudes (must clamp, not crash)
    "average number of", "share of", "what percentage of",
    "what is the earliest", "when was the latest",
    "top 99999999999", "first 99999999999999999999",
    // stat-metric intent (exact percentile / stddev)
    "median", "what is the median", "90th percentile of",
    "25th percentile of", "standard deviation of", "stddev of")

  private val statusWords = Gen.oneOf(
    "", "open", "finished", "pending", "urgent", "not finished",
    "non-urgent", "returned", "not returned", "english", "not english",
    "click", "excluding error")

  private val entities = Gen.oneOf(
    "orders", "customers", "line items", "parts", "suppliers", "events",
    "documents", "nations")

  private val suffixes = Gen.oneOf(
    "", "in 1996", "since 1997", "after 1998", "before 2000",
    "from 1995 to 1997", "by nation", "per status", "by year",
    "per customer", "in each segment", "with customer names",
    "with their nations", "named widget", "about data",
    "with the highest balance", "per supplier", "by priority",
    "over 100000", "under 500", "above 9000", "worth more than 250000",
    // day-precision date phrasings (extractDateRange)
    "between 01-02-1995 and 28-02-1995", "on 19-06-1995",
    "from 11-05-1997 onwards", "in february 1996", "in the last 30 days",
    "between 1995-03-01 and 1995-04-15", "from the last 90 days",
    // r6 intents + adversarial magnitudes
    "between 50000 and 150000", "with value between 100 and 200",
    "by status and year", "by language and source",
    "by event type and month", "per user", "per source", "date",
    "by day", "per day",
    "in the last 99999999999 days", "over 99999999999999999999",
    "between 99999999999 and 999999999999")

  private val metricPrefixes = Gen.oneOf(
    "average", "maximum", "minimum", "mean", "how many different",
    "count distinct", "how many unique")

  private val questions: Gen[String] = for {
    p <- Gen.frequency(3 -> prefixes, 1 -> metricPrefixes)
    st <- statusWords
    e <- entities
    s1 <- suffixes
    s2 <- suffixes
  } yield Seq(p, st, e, s1, s2).filter(_.nonEmpty).mkString(" ")

  test("every generated question plans into guard-clean SQL that analyzes") {
    Tables.registerAll(spark, sf0001)
    val prop = Prop.forAll(questions) { q =>
      val plan = Planner.plan(q)
      QueryGuard.validate(plan.sql) match {
        case Left(d) =>
          Prop.falsified :| s"'$q' -> guard DENIED ${d.reason}: ${plan.sql}"
        case Right(cleaned) =>
          try {
            spark.sql(cleaned).queryExecution.analyzed // analysis only
            Prop.passed
          } catch {
            case e: Exception =>
              Prop.falsified :| s"'$q' -> analysis failed: ${plan.sql}\n  ${e.getMessage.takeWhile(_ != '\n')}"
          }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
