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
  * intents — count, list, search, grouped aggregation — with date-range,
  * status-filter and FK-join features extracted from the question
  * (the reference's `questions.txt` categories).
  */
object Planner {

  final case class Plan(
      intent: String,            // count | list | aggregate | search
      table: String,
      needsAggregation: Boolean,
      limit: Int,
      sql: String,
      yearRange: Option[(Int, Int)] = None,
      statusFilter: Option[String] = None,
      groupDim: Option[String] = None,
      joined: Seq[String] = Nil)

  private val tableKeywords: Map[String, Seq[String]] = Map(
    "orders" -> Seq("order", "purchase history"),
    "customer" -> Seq("customer", "client", "person"),
    "lineitem" -> Seq("line item", "item", "shipment"),
    "events" -> Seq("event", "click", "activity"),
    "documents" -> Seq("document", "text", "corpus"),
    "nation" -> Seq("nation", "country"),
    "supplier" -> Seq("supplier", "vendor"),
    "part" -> Seq("part", "product"))

  private val dateCols = Map(
    "orders" -> "o_orderdate", "lineitem" -> "l_shipdate", "events" -> "ts")

  private val numericCols = Map(
    "orders" -> "o_totalprice", "lineitem" -> "l_extendedprice",
    "events" -> "value", "customer" -> "c_acctbal", "supplier" -> "s_acctbal",
    "part" -> "p_retailprice", "documents" -> "n_chars")

  private val searchCols = Map(
    "customer" -> "c_name", "supplier" -> "s_name", "part" -> "p_name",
    "nation" -> "n_name", "documents" -> "text")

  /** FK join chains between co-mentioned tables (reference: schema-graph
    * join planning, `intelligent_query_planner.py:233-287`). */
  private val joinPathsBase: Map[(String, String), String] = Map(
    ("orders", "customer") -> "orders JOIN customer ON o_custkey = c_custkey",
    ("orders", "nation") -> ("orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey"),
    ("customer", "nation") -> "customer JOIN nation ON c_nationkey = n_nationkey",
    ("lineitem", "orders") -> "lineitem JOIN orders ON l_orderkey = o_orderkey",
    ("lineitem", "part") -> "lineitem JOIN part ON l_partkey = p_partkey",
    ("lineitem", "supplier") -> "lineitem JOIN supplier ON l_suppkey = s_suppkey",
    ("supplier", "nation") -> "supplier JOIN nation ON s_nationkey = n_nationkey")

  /** Direction-agnostic: "orders with customers" and "customers with
    * orders" plan the same join. */
  private val joinPaths: Map[(String, String), String] =
    joinPathsBase ++ joinPathsBase.map { case ((a, b), v) => ((b, a), v) }

  /** Grouping dimension for aggregate intents: "by <kw>" / "per <kw>" →
    * (group column, fact table, FROM clause). */
  private final case class DimRule(kw: String, col: String, fact: String, from: String)
  private val dims = Seq(
    DimRule("nation", "n_name", "orders",
      joinPaths(("orders", "nation"))),
    DimRule("customer", "c_name", "orders", joinPaths(("orders", "customer"))),
    DimRule("supplier", "s_name", "lineitem", joinPaths(("lineitem", "supplier"))),
    DimRule("brand", "p_brand", "lineitem", joinPaths(("lineitem", "part"))),
    DimRule("priority", "o_orderpriority", "orders", "orders"),
    DimRule("status", "o_orderstatus", "orders", "orders"),
    DimRule("segment", "c_mktsegment", "customer", "customer"),
    DimRule("event type", "event_type", "events", "events"),
    DimRule("language", "lang", "documents", "documents"),
    DimRule("source", "source", "documents", "documents"),
    DimRule("year", "", "orders", "orders")) // col resolved from the date column

  /** Status / category filters: keyword → (table it applies to, predicate). */
  private val statusRules = Seq(
    ("open", "orders", "o_orderstatus = 'O'"),
    ("finished", "orders", "o_orderstatus = 'F'"),
    ("pending", "orders", "o_orderstatus = 'P'"),
    ("urgent", "orders", "o_orderpriority = '1-URGENT'"),
    ("high priority", "orders", "o_orderpriority = '2-HIGH'"),
    ("low priority", "orders", "o_orderpriority = '5-LOW'"),
    ("returned", "lineitem", "l_returnflag = 'R'"),
    ("click", "events", "event_type = 'click'"),
    ("purchase events", "events", "event_type = 'purchase'"),
    ("error", "events", "event_type = 'error'"),
    ("signup", "events", "event_type = 'signup'"),
    ("view", "events", "event_type = 'view'"),
    ("english", "documents", "lang = 'en'"),
    ("french", "documents", "lang = 'fr'"),
    ("german", "documents", "lang = 'de'"),
    ("spanish", "documents", "lang = 'es'"),
    ("chinese", "documents", "lang = 'zh'"))

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

  /** Q3 — date-range extraction: "in 1996", "since 1997", "before 1999",
    * "from 1995 to 1997" → inclusive year bounds. */
  def extractYearRange(q: String): Option[(Int, Int)] = {
    val s = q.toLowerCase
    "(?:between|from)\\s+(\\d{4})\\s+(?:and|to)\\s+(\\d{4})".r.findFirstMatchIn(s)
      .map(m => (m.group(1).toInt, m.group(2).toInt))
      .orElse("(?:since|after)\\s+(\\d{4})".r.findFirstMatchIn(s)
        .map(m => (m.group(1).toInt, 9999)))
      .orElse("before\\s+(\\d{4})".r.findFirstMatchIn(s)
        .map(m => (0, m.group(1).toInt - 1)))
      .orElse("\\bin\\s+(\\d{4})\\b".r.findFirstMatchIn(s)
        .map(m => (m.group(1).toInt, m.group(1).toInt)))
  }

  /** Q3 — status/category filter applicable to the chosen table. */
  def extractStatusFilter(q: String, table: String): Option[String] = {
    val s = q.toLowerCase
    statusRules.collectFirst {
      case (kw, t, pred) if t == table && s.contains(kw) => pred
    }
  }

  /** Q3 — search-term extraction; the term is sanitized to alphanumerics
    * so generated SQL can never break out of its literal. */
  def extractSearchTerm(q: String): Option[String] =
    "(?:named|called|about|containing)\\s+([A-Za-z0-9#]+)".r
      .findFirstMatchIn(q.toLowerCase).map(_.group(1))

  /** Q3 — join detection: a co-mentioned table reachable from the primary
    * via the FK graph. */
  def detectSecondary(q: String, primary: String): Option[String] = {
    val s = q.toLowerCase
    val hits = for {
      (table, kws) <- tableKeywords.toSeq if table != primary
      kw <- kws if s.contains(kw) && joinPaths.contains((primary, table))
    } yield (table, kw.length)
    if (hits.isEmpty) None else Some(hits.maxBy { case (t, len) => (len, t) }._1)
  }

  private def extractGroupDim(q: String): Option[DimRule] = {
    val s = q.toLowerCase
    dims.find(d => s.contains("by " + d.kw) || s.contains("per " + d.kw))
  }

  /** Q4 — deterministic SQL generation for the supported intents. */
  def plan(q: String): Plan = {
    val intent = detectIntent(q)
    val limit = extractLimit(q)
    val dim = if (intent == "aggregate") extractGroupDim(q) else None
    val table = dim.map(_.fact).getOrElse(matchTable(q))
    val years = extractYearRange(q)
    val status = extractStatusFilter(q, table)
    val secondary = if (dim.isEmpty) detectSecondary(q, table) else None
    val from = dim.map(_.from)
      .orElse(secondary.map(sec => joinPaths((table, sec))))
      .getOrElse(table)

    val dateCond = years.flatMap { case (a, b) =>
      dateCols.get(table).map(dc => s"year($dc) BETWEEN $a AND $b")
    }
    val searchCond =
      if (intent == "search")
        extractSearchTerm(q).flatMap(t0 =>
          searchCols.get(table).map(c => s"lower($c) LIKE '%$t0%'"))
      else None
    val conds = dateCond.toSeq ++ status.toSeq ++ searchCond.toSeq
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")

    val sql = intent match {
      case "count" => s"SELECT COUNT(*) AS n FROM $from$where"
      case "aggregate" =>
        val num = numericCols.getOrElse(table, "1")
        dim match {
          case Some(d) =>
            val g = if (d.kw == "year")
              s"year(${dateCols.getOrElse(table, "o_orderdate")})" else d.col
            s"SELECT $g AS grp, COUNT(*) AS n, SUM($num) AS total FROM $from$where GROUP BY $g"
          case None =>
            s"SELECT COUNT(*) AS n, SUM($num) AS total FROM $from$where"
        }
      case _ => s"SELECT * FROM $from$where LIMIT $limit"
    }
    Plan(intent, table, needsAggregation(q), limit, sql,
      yearRange = years, statusFilter = status,
      groupDim = dim.map(_.kw), joined = secondary.toSeq)
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
