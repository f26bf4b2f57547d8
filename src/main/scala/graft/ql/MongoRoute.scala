package graft.ql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** NL → document-store routing: the rebuild's twin of the reference's
  * planner dispatching a natural-language question to its SECOND query
  * surface (`chatbot/intelligent_query_planner.py` routes to either the
  * SQL executor or `mongo_executor.py`). The deterministic [[Planner]]
  * stays the single NL front end; this module decides whether its plan is
  * expressible as a validated find/aggregate, emits the Mongo-surface
  * JSON, and runs it through [[MongoQL]] — so one question can be
  * answered by BOTH surfaces and compared.
  *
  * Routable subset (the listing/filter intents): un-joined `list`,
  * `search`, ungrouped `count`, and (round-11, on the grown stage
  * surface) plain-column GROUPED count plans whose filters are plain
  * equality / year-range / substring predicates. Anything wider (joins,
  * function dims like year(), metrics, thresholds) returns None and
  * stays on the SQL surface — a router must never guess.
  *
  * Parity contract: for every routed plan, MongoQL's result must equal
  * the SQL surface's rows (the `qlm_nl_*` gates hash-compare both paths
  * against one oracle). The status columns this touches are non-null in
  * the corpus, so Mongo's null-safe $ne and SQL's NOT(=) agree; the
  * parity gate would catch a corpus where they did not.
  */
object MongoRoute {

  /** A plan routed to the document surface: the collection plus the JSON
    * the Mongo executor would receive. `kind` is "find" or "aggregate".
    * `renameIdTo` carries the SQL surface's group-column alias so the
    * executor can normalize Mongo's synthetic `_id` back to it. */
  final case class Routed(
      collection: String,
      kind: String,
      filterJson: String,
      pipelineJson: String,
      limit: Int,
      renameIdTo: Option[String] = None)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** "col = 'val'" (the shape every Planner status rule emits) →
    * a Mongo filter fragment; negation compiles to $ne (null-safe — the
    * document-model semantics; equal on the non-null status columns). */
  private val EqPred = """^(\w+) = '([^']+)'$""".r

  private def statusFragment(pred: String, negated: Boolean): Option[String] = {
    val inner = if (negated) {
      val p = pred.stripPrefix("NOT (").stripSuffix(")")
      EqPred.findFirstMatchIn(p).map(m =>
        s"${jsonStr(m.group(1))}: {${jsonStr("$ne")}: ${jsonStr(m.group(2))}}")
    } else
      EqPred.findFirstMatchIn(pred).map(m =>
        s"${jsonStr(m.group(1))}: ${jsonStr(m.group(2))}")
    inner
  }

  private def yearFragment(table: String, years: (Int, Int)): Option[String] =
    Planner.dateCols.get(table).map { dc =>
      val (a, b) = years
      s"${jsonStr(dc)}: {${jsonStr("$gte")}: ${jsonStr(f"$a%04d-01-01")}, " +
        s"${jsonStr("$lt")}: ${jsonStr(f"${b + 1}%04d-01-01")}}"
    }

  /** Route a question end-to-end; None = not expressible, stay on SQL. */
  def fromQuestion(q: String): Option[Routed] = fromPlan(Planner.plan(q), q)

  /** The grouped-count SQL shape the Planner emits for a plain-column
    * dim — the one grouped form the document surface can answer
    * ($group {_id: "$col", n: {$sum: 1}}). Function dims (year()/
    * date_format()) have no compiled-expression equivalent and stay on
    * the SQL surface. */
  private val GroupedCount =
    """^SELECT (\w+) AS grp, COUNT\(\*\) AS n FROM (\w+)(.*) GROUP BY \1$""".r

  def fromPlan(p: Planner.Plan, q: String): Option[Routed] = {
    // joins, orderings beyond the key, and un-applied year ranges are
    // SQL-surface territory; group dims route only through the guarded
    // grouped-count shape below
    if (p.joined.nonEmpty || p.orderBy.isDefined ||
        !p.yearApplied || !graft.core.Tables.all.contains(p.table))
      return None
    if (p.groupDim.isDefined &&
        !(p.intent == "count" && GroupedCount.findFirstIn(p.sql).isDefined))
      return None
    val statusPart: Option[Seq[String]] = p.statusFilter match {
      case None => Some(Nil)
      case Some(pred) => statusFragment(pred, p.negated).map(Seq(_))
    }
    val yearPart: Seq[String] = p.yearRange.toSeq.flatMap(yearFragment(p.table, _))
    val term: Option[String] =
      if (p.intent == "search") Planner.extractSearchTerm(q) else None
    val searchPart: Seq[String] = term.toSeq.flatMap(t =>
      Planner.searchCols.get(p.table).map(c =>
        // (?i) ≡ the SQL surface's lower(col) LIKE '%term%' (the term is
        // already sanitized to alphanumerics by the extractor)
        s"${jsonStr(c)}: {${jsonStr("$regex")}: ${jsonStr("(?i)" + t)}}"))

    // THE ROUTING GUARD: rebuild, from exactly the parts translated above,
    // the SQL the Planner would emit for this plan — and route only when
    // it matches p.sql verbatim. Any untranslated condition (threshold
    // phrases, day-precision date ranges, …) makes the reconstruction
    // differ, and the plan stays on the SQL surface instead of silently
    // answering with a WIDER filter than the user asked for.
    val dateCondSql = p.yearRange.flatMap(y => Planner.dateCols.get(p.table)
      .map(dc => s"year($dc) BETWEEN ${y._1} AND ${y._2}"))
    val searchCondSql = term.flatMap(t => Planner.searchCols.get(p.table)
      .map(c => s"lower($c) LIKE '%$t%'"))
    val conds = dateCondSql.toSeq ++ p.statusFilter.toSeq ++ searchCondSql.toSeq
    val whereSql = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")

    for {
      st <- statusPart
      filter = (st ++ yearPart ++ searchPart).mkString("{", ", ", "}")
      routed <- p.intent match {
        case "list" | "search" =>
          // the SQL surface orders by the table key for determinism under
          // LIMIT; mirror it with $sort on the same key
          Planner.keyCols.get(p.table).flatMap { k =>
            val expected = s"SELECT * FROM ${p.table}$whereSql ORDER BY $k LIMIT ${p.limit}"
            if (p.sql != expected) None
            else {
              val pipe = s"""[{"$$match": $filter}, {"$$sort": {${jsonStr(k)}: 1}}, {"$$limit": ${p.limit}}]"""
              Some(Routed(p.table, "aggregate", filter, pipe, p.limit))
            }
          }
        case "count" if p.groupDim.isEmpty =>
          val expected = s"SELECT COUNT(*) AS n FROM ${p.table}$whereSql"
          if (p.sql != expected) None
          else {
            val pipe = s"""[{"$$match": $filter}, {"$$group": {"_id": null, "n": {"$$sum": 1}}}]"""
            Some(Routed(p.table, "aggregate", filter, pipe, 1))
          }
        case "count" =>
          // grouped count over a plain column: the routing guard is the
          // same reconstruct-and-compare — the regex pinned the shape,
          // this pins every translated condition
          GroupedCount.findFirstMatchIn(p.sql).flatMap { m =>
            val (gcol, tbl) = (m.group(1), m.group(2))
            val expected =
              s"SELECT $gcol AS grp, COUNT(*) AS n FROM ${p.table}$whereSql GROUP BY $gcol"
            if (p.sql != expected || tbl != p.table) None
            else {
              val pipe =
                s"""[{"$$match": $filter}, {"$$group": {"_id": ${jsonStr("$" + gcol)}, "n": {"$$sum": 1}}}]"""
              Some(Routed(p.table, "aggregate", filter, pipe, 1000,
                renameIdTo = Some("grp")))
            }
          }
        case _ => None
      }
    } yield routed
  }

  /** Execute a routed plan through the validated Mongo surface and
    * normalize to the SQL surface's column shape (the ungrouped count's
    * synthetic `_id: null` column is dropped). */
  def run(s: SparkSession, dir: String, r: Routed): Either[MongoQL.Denied, DataFrame] =
    MongoQL.aggregateCollection(s, dir, r.collection, r.pipelineJson,
      maxRows = math.max(r.limit, 1000)).map { df =>
      r.renameIdTo match {
        case Some(alias) => df.withColumnRenamed("_id", alias)
        case None =>
          if (df.columns.contains("_id") && df.columns.contains("n") &&
              df.columns.length == 2) df.select("n") else df
      }
    }
}
