package graft.ql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Deterministic rule-based query planner (SURVEY.md §2.10 Q1–Q4, Q7):
  * the reference routes NL questions through intent detection, table
  * matching, feature extraction (aggregation/join/time-filter/limit),
  * and schema-context assembly before SQL generation
  * (`chatbot/agents/intelligent_query_planner.py:102-345`). The LLM
  * generator is external; this deterministic planner is enough for the
  * engine-side contract and produces runnable Spark SQL for the common
  * intents.
  */
object Planner {

  final case class Plan(
      intent: String,            // count | list | aggregate | search
      table: String,
      needsAggregation: Boolean,
      limit: Int,
      sql: String)

  private val tableKeywords: Map[String, Seq[String]] = Map(
    "orders" -> Seq("order", "purchase history"),
    "customer" -> Seq("customer", "client", "person"),
    "lineitem" -> Seq("line item", "item", "shipment"),
    "events" -> Seq("event", "click", "activity"),
    "documents" -> Seq("document", "text", "corpus"),
    "nation" -> Seq("nation", "country"),
    "supplier" -> Seq("supplier", "vendor"),
    "part" -> Seq("part", "product"))

  /** Q1 — intent detection by keyword rules, priority-ordered. */
  def detectIntent(q: String): String = {
    val s = q.toLowerCase
    if (s.contains("how many") || s.contains("count")) "count"
    else if (Seq("sum", "total", "average", "avg per", "by ").exists(s.contains)) "aggregate"
    else if (Seq("find", "search", "named", "called").exists(s.contains)) "search"
    else "list"
  }

  /** Q2 — table matcher: first table whose keyword list hits; ties go to
    * the longest matched keyword (most specific). */
  def matchTable(q: String): String = {
    val s = q.toLowerCase
    val hits = for {
      (table, kws) <- tableKeywords.toSeq
      kw <- kws if s.contains(kw)
    } yield (table, kw.length)
    if (hits.isEmpty) "orders"
    else hits.maxBy { case (t, len) => (len, t) }._1
  }

  /** Q3 — LIMIT extraction: "top N" / "first N" / default 100. */
  def extractLimit(q: String): Int =
    "(?:top|first|limit)\\s+(\\d+)".r.findFirstMatchIn(q.toLowerCase)
      .map(_.group(1).toInt).getOrElse(100)

  /** Q3 — aggregation-need detection. */
  def needsAggregation(q: String): Boolean =
    detectIntent(q) == "count" || detectIntent(q) == "aggregate"

  /** Q4 — deterministic SQL generation for the supported intents. */
  def plan(q: String): Plan = {
    val intent = detectIntent(q)
    val table = matchTable(q)
    val limit = extractLimit(q)
    val sql = intent match {
      case "count" => s"SELECT COUNT(*) AS n FROM $table"
      case _ => s"SELECT * FROM $table LIMIT $limit"
    }
    Plan(intent, table, needsAggregation(q), limit, sql)
  }

  // ---- Q7: schema fetch + cache ------------------------------------------

  private val schemaCache = TrieMap.empty[String, Seq[(String, String)]]

  /** Columns of a registered view, memoized (reference: redis-cached
    * information_schema fetch, `nodes.py:1070-1157`). */
  def schemaOf(spark: SparkSession, table: String): Seq[(String, String)] =
    schemaCache.getOrElseUpdate(table,
      spark.table(table).schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString))

  def clearSchemaCache(): Unit = schemaCache.clear()
}
