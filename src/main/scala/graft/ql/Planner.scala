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
      intent: String,            // count | list | aggregate | search | topk_group | topk_by | which_group
      table: String,
      needsAggregation: Boolean,
      limit: Int,
      sql: String,
      yearRange: Option[(Int, Int)] = None,
      statusFilter: Option[String] = None,
      groupDim: Option[String] = None,
      joined: Seq[String] = Nil,
      /** false when a year range was recognized but no date column could
        * be resolved on the primary or joined table — the caller can tell
        * the filter was dropped instead of mistaking unfiltered rows for
        * a filtered answer. */
      yearApplied: Boolean = true,
      /** true when the status filter is negated ("not finished"). */
      negated: Boolean = false,
      /** ORDER BY applied for superlative phrasings ("most expensive"). */
      orderBy: Option[String] = None)

  private val tableKeywords: Map[String, Seq[String]] = Map(
    "orders" -> Seq("order", "purchase history"),
    "customer" -> Seq("customer", "client", "person"),
    "lineitem" -> Seq("line item", "item", "shipment"),
    "events" -> Seq("event", "click", "activity"),
    "documents" -> Seq("document", "text", "corpus"),
    "nation" -> Seq("nation", "country"),
    "supplier" -> Seq("supplier", "vendor"),
    "part" -> Seq("part", "product"))

  private[ql] val dateCols = Map(
    "orders" -> "o_orderdate", "lineitem" -> "l_shipdate", "events" -> "ts")

  private val numericCols = Map(
    "orders" -> "o_totalprice", "lineitem" -> "l_extendedprice",
    "events" -> "value", "customer" -> "c_acctbal", "supplier" -> "s_acctbal",
    "part" -> "p_retailprice", "documents" -> "n_chars")

  private[ql] val searchCols = Map(
    "customer" -> "c_name", "supplier" -> "s_name", "part" -> "p_name",
    "nation" -> "n_name", "documents" -> "text")

  /** Stable tie-break key per table so superlative / top-k-per-group
    * rankings are deterministic under ties. */
  private[ql] val keyCols = Map(
    "orders" -> "o_orderkey", "customer" -> "c_custkey",
    "supplier" -> "s_suppkey", "part" -> "p_partkey",
    "nation" -> "n_nationkey", "lineitem" -> "l_orderkey",
    "events" -> "event_id", "documents" -> "doc_id")

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
    * (group column, owning table, default fact table, FROM clause). */
  private final case class DimRule(
      kw: String, col: String, table: String, fact: String, from: String)
  private val dims = Seq(
    DimRule("nation", "n_name", "nation", "orders",
      joinPaths(("orders", "nation"))),
    DimRule("customer", "c_name", "customer", "orders",
      joinPaths(("orders", "customer"))),
    DimRule("supplier", "s_name", "supplier", "lineitem",
      joinPaths(("lineitem", "supplier"))),
    DimRule("brand", "p_brand", "part", "lineitem",
      joinPaths(("lineitem", "part"))),
    DimRule("priority", "o_orderpriority", "orders", "orders", "orders"),
    DimRule("status", "o_orderstatus", "orders", "orders", "orders"),
    DimRule("segment", "c_mktsegment", "customer", "customer", "customer"),
    DimRule("event type", "event_type", "events", "events", "events"),
    DimRule("language", "lang", "documents", "documents", "documents"),
    DimRule("source", "source", "documents", "documents", "documents"),
    // col resolved from the date column for the derived time dims
    DimRule("day", "", "events", "events", "events"),
    DimRule("month", "", "orders", "orders", "orders"),
    DimRule("year", "", "orders", "orders", "orders"))

  /** The derived time dims (empty raw col; resolved via [[groupExpr]]). */
  private val timeKw = Set("year", "month", "day")

  /** Grouping expression for a dim on `table` — time dims derive from the
    * table's date column ("year" → year(dc), "month" → 'yyyy-MM'). */
  private def groupExpr(d: DimRule, table: String): String = d.kw match {
    case "year" => s"year(${dateCols.getOrElse(table, "o_orderdate")})"
    case "month" =>
      s"date_format(${dateCols.getOrElse(table, "o_orderdate")}, 'yyyy-MM')"
    case "day" =>
      // a STRING day, not a DATE: both engines then emit the same dtype
      s"date_format(${dateCols.getOrElse(table, "o_orderdate")}, 'yyyy-MM-dd')"
    case _ => d.col
  }

  /** Fact table + FROM clause for a grouped plan: time dims ("by month",
    * "per year") group whatever table the QUESTION names — their DimRule
    * fact is only the no-table-mentioned default — while entity dims own
    * their fact/join chain. */
  private def dimFactFrom(q: String, d: DimRule): (String, String) =
    if (d.kw == "year" || d.kw == "month" || d.kw == "day") {
      val t = matchTable(q)
      // a dateless table ("nations by year") falls back to the dim's
      // default fact rather than planning year() over a missing column
      if (dateCols.contains(t)) (t, t) else (d.fact, d.from)
    } else (d.fact, d.from)

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

  /** Q1 — intent detection by keyword rules, priority-ordered. The
    * "by <dim>" aggregate cue must not fire on ordering phrases
    * ("ordered by date" is a list, not a group-by). */
  def detectIntent(q: String): String = {
    val s = q.toLowerCase.replaceAll("(?:ordered|sorted|order)\\s+by\\s+", " ")
    // "count" must start a word: "account balance" is not a count cue
    if (s.contains("how many") || "(?<![a-z])count".r.findFirstIn(s).isDefined) "count"
    else if (Seq("sum", "total", "average", "mean ", "maximum", "minimum",
      "avg per", "by ").exists(s.contains)) "aggregate"
    else if (Seq("find", "search", "named", "called").exists(s.contains)) "search"
    else "list"
  }

  /** Aggregate-function selection: "average order value" must compute an
    * AVG, not a SUM (metric, output alias). Default (SUM, total). */
  def extractMetric(q: String): (String, String) = {
    val s = q.toLowerCase
    if (Seq("average", "mean ", "avg ").exists(s.contains)) ("AVG", "avg_value")
    else if (Seq("maximum", "max ").exists(s.contains)) ("MAX", "max_value")
    else if (Seq("minimum", "min ").exists(s.contains)) ("MIN", "min_value")
    else ("SUM", "total")
  }

  /** Numeric threshold filter: "orders over 100000", "customers with
    * balance below 0". */
  def extractThreshold(q: String, table: String): Option[String] =
    extractThresholdAmong(q, Seq(table))

  /** When several joined tables are in play ("orders over 250000 with
    * customer names"), the threshold binds to the table whose keyword
    * occurs NEAREST BEFORE the threshold phrase — not to whichever table
    * won the primary-table ranking. */
  def extractThresholdAmong(q: String, tables: Seq[String]): Option[String] = {
    val s = q.toLowerCase.replace(",", "")
    val over = "(?:over|above|more than|greater than|exceeds?|exceeding|at least)\\s+\\$?(\\d+(?:\\.\\d+)?)".r
    val under = "(?:under|below|less than|at most|cheaper than)\\s+\\$?(\\d+(?:\\.\\d+)?)".r
    // numeric BETWEEN: "orders between 50000 and 150000". Two 4-digit
    // numbers in the plausible-year band stay a DATE range (the year
    // extractor's contract); anything else is a value range.
    val between = "between\\s+\\$?(\\d+(?:\\.\\d+)?)\\s+and\\s+\\$?(\\d+(?:\\.\\d+)?)".r
    def isYearish(v: String): Boolean =
      v.length == 4 && !v.contains(".") && {
        val y = v.toInt; y >= 1900 && y <= 2100
      }
    def bind(start: Int, render: String => String): Option[String] = {
      val byProximity = tables.distinct.flatMap { t =>
        numericCols.get(t).flatMap { num =>
          tableKeywords.getOrElse(t, Nil)
            .map(kw => s.lastIndexOf(kw, start)).filter(_ >= 0)
            .maxOption.map(i => (start - i, num))
        }
      }
      byProximity.sortBy(_._1).headOption.map(_._2)
        .orElse(tables.flatMap(numericCols.get).headOption)
        .map(render)
    }
    between.findFirstMatchIn(s)
      .filterNot(m => isYearish(m.group(1)) && isYearish(m.group(2)))
      .flatMap(m => bind(m.start,
        num => s"$num BETWEEN ${m.group(1)} AND ${m.group(2)}"))
      .orElse {
        over.findFirstMatchIn(s).map((_, ">"))
          .orElse(under.findFirstMatchIn(s).map((_, "<")))
          .flatMap { case (m, op) =>
            bind(m.start, num => s"$num $op ${m.group(1)}")
          }
      }
  }

  /** Q2 — table matcher: first table whose keyword list hits; ties go to
    * the longest matched keyword (most specific). Ordering phrases are
    * stripped first — "events ordered by time" must not match the orders
    * table through the substring "order" in "ordered". */
  def matchTable(q: String): String = {
    val s = q.toLowerCase.replaceAll("(?:ordered|sorted|order)\\s+by\\s+", " ")
    val hits = for {
      (table, kws) <- tableKeywords.toSeq
      kw <- kws if s.contains(kw)
    } yield (table, kw.length)
    if (hits.isEmpty) "orders"
    else hits.maxBy { case (t, len) => (len, t) }._1
  }

  /** Digit-run → Int without a NumberFormatException escape hatch:
    * "top 99999999999" must clamp, not crash the planner mid-question. */
  private def intCapped(digits: String, cap: Int): Int =
    if (digits.length > 9) cap else math.min(digits.toInt, cap)

  /** Q3 — LIMIT extraction: "top N" / "first N" / default 100. */
  def extractLimit(q: String): Int =
    "(?:top|first|limit)\\s+(\\d+)".r.findFirstMatchIn(q.toLowerCase)
      .map(m => intCapped(m.group(1), 1000000)).getOrElse(100)

  /** Q3 — aggregation-need detection. */
  def needsAggregation(q: String): Boolean =
    detectIntent(q) == "count" || detectIntent(q) == "aggregate"

  /** Q3 — date-range extraction: "in 1996", "since 1997" (inclusive),
    * "after 1997" (exclusive → starts at 1998), "before 1999" (exclusive),
    * "from 1995 to 1997" → inclusive year bounds. */
  def extractYearRange(q: String): Option[(Int, Int)] = {
    val s = q.toLowerCase
    "(?:between|from)\\s+(\\d{4})\\s+(?:and|to)\\s+(\\d{4})".r.findFirstMatchIn(s)
      .map(m => (m.group(1).toInt, m.group(2).toInt))
      .orElse("since\\s+(\\d{4})".r.findFirstMatchIn(s)
        .map(m => (m.group(1).toInt, 9999)))
      .orElse("after\\s+(\\d{4})".r.findFirstMatchIn(s)
        .map(m => (m.group(1).toInt + 1, 9999)))
      .orElse("before\\s+(\\d{4})".r.findFirstMatchIn(s)
        .map(m => (0, m.group(1).toInt - 1)))
      .orElse("\\bin\\s+(\\d{4})\\b".r.findFirstMatchIn(s)
        .map(m => (m.group(1).toInt, m.group(1).toInt)))
  }

  /** Deterministic "today" for relative phrasings ("last 30 days") — the
    * reference resolves them against now(); a reproducible engine pins
    * the anchor to the testdata's end-of-data date so plans are stable
    * across runs (same rationale as GoldMvFull.Anchor). */
  private val AnchorDate = java.time.LocalDate.of(2001, 8, 1)

  private val monthNames = Seq("january", "february", "march", "april",
    "may", "june", "july", "august", "september", "october", "november",
    "december")

  /** Day-precision date-range extraction — the reference corpus's
    * date-based category (`questions.txt` 6-10): "between 01-01-1995 and
    * 31-01-1995", "on 27-02-1995", "from 11-05-1995 onwards", "in
    * february 1995", "last 30 days". Accepts DD-MM-YYYY and YYYY-MM-DD
    * literals. Returns inclusive ISO bounds; takes precedence over the
    * year-only range when both could match. */
  def extractDateRange(q: String): Option[(String, String)] = {
    val s = q.toLowerCase
    def iso(d: String): Option[String] = {
      val dmy = "(\\d{2})-(\\d{2})-(\\d{4})".r
      val ymd = "(\\d{4})-(\\d{2})-(\\d{2})".r
      d match {
        case dmy(dd, mm, yyyy) => Some(s"$yyyy-$mm-$dd")
        case ymd(yyyy, mm, dd) => Some(s"$yyyy-$mm-$dd")
        case _ => None
      }
    }
    val dateLit = "(\\d{2}-\\d{2}-\\d{4}|\\d{4}-\\d{2}-\\d{2})"
    val between = s"between\\s+$dateLit\\s+and\\s+$dateLit".r
    val onwards = s"(?:from|since)\\s+$dateLit(?:\\s+onwards?)?".r
    val on = s"\\bon\\s+$dateLit".r
    val lastN = "last\\s+(\\d+)\\s+days".r
    val inMonth = s"\\bin\\s+(${monthNames.mkString("|")})\\s+(\\d{4})".r
    between.findFirstMatchIn(s)
      .flatMap(m => for (a <- iso(m.group(1)); b <- iso(m.group(2))) yield (a, b))
      .orElse(onwards.findFirstMatchIn(s)
        .flatMap(m => iso(m.group(1)).map(a => (a, "9999-12-31"))))
      .orElse(on.findFirstMatchIn(s)
        .flatMap(m => iso(m.group(1)).map(a => (a, a))))
      .orElse(lastN.findFirstMatchIn(s).map { m =>
        // clamp absurd day counts: LocalDate.minusDays throws outside
        // its supported range, and "last 9e18 days" means "everything"
        val days = math.min(intCapped(m.group(1), 3650000), 3650000).toLong
        (AnchorDate.minusDays(days).toString, AnchorDate.toString)
      })
      .orElse(inMonth.findFirstMatchIn(s).map { m =>
        val ym = java.time.YearMonth.of(m.group(2).toInt,
          monthNames.indexOf(m.group(1)) + 1)
        (ym.atDay(1).toString, ym.atEndOfMonth().toString)
      })
  }

  /** A negator token (optionally with one intervening word) directly
    * before position `idx`: "not finished", "non-urgent", "excluding
    * returned", "not yet finished". */
  private def negatedAt(s: String, idx: Int): Boolean = {
    val prefix = s.substring(math.max(0, idx - 24), idx)
    "\\b(?:not|non|no|excluding|except|without)[\\s-]+(?:\\w+[\\s-]+)?$".r
      .findFirstIn(prefix).isDefined
  }

  /** Q3 — status/category filter applicable to the chosen table, with
    * negation support ("orders that are not finished" → NOT (pred)). */
  def extractStatusFilter(q: String, table: String): Option[String] =
    extractStatusFilterN(q, table).map(_._1)

  /** Like [[extractStatusFilter]] but also reports whether the predicate
    * was negated. */
  def extractStatusFilterN(q: String, table: String): Option[(String, Boolean)] = {
    val s = q.toLowerCase
    statusRules.collectFirst {
      case (kw, t, pred) if t == table && s.contains(kw) =>
        if (negatedAt(s, s.indexOf(kw))) (s"NOT ($pred)", true) else (pred, false)
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
    dims.find(d => Seq("by ", "per ", "in each ", "for each ", "of each ")
      .exists(sep => s.contains(sep + d.kw)))
  }

  /** Two-dimension grouping: "by <dim1> and <dim2>" ("orders by status
    * and year", "documents by language and source"). Both dims must land
    * on ONE fact table — entity dims must own their fact (no join chains
    * in two-dim mode), time dims ride the other dim's fact — otherwise
    * the caller falls back to the single-dim path. */
  private def extractDimPair(q: String): Option[(DimRule, DimRule, String)] = {
    val s = q.toLowerCase
    val pair = (for {
      sep <- Seq("by ", "per ", "in each ", "for each ", "of each ").iterator
      i = s.indexOf(sep) if i >= 0
      rest = s.substring(i + sep.length)
      d1 <- dims.find(d => rest.startsWith(d.kw)).iterator
      m <- "^\\s+and\\s+(.+)$".r.findFirstMatchIn(rest.substring(d1.kw.length)).iterator
      d2 <- dims.find(d => m.group(1).startsWith(d.kw)).iterator
      if d2.kw != d1.kw
    } yield (d1, d2)).nextOption()
    pair.flatMap { case (d1, d2) =>
      val entityDims = Seq(d1, d2).filterNot(d => timeKw(d.kw))
      val fact = entityDims match {
        case Seq() => None // "by year and month" — no fact anchor, skip
        case ds if ds.forall(d => d.table == d.fact) &&
          ds.map(_.fact).distinct.size == 1 => Some(ds.head.fact)
        case _ => None
      }
      fact
        .filter(f => entityDims.size == 2 || dateCols.contains(f))
        .map(f => (d1, d2, f))
    }
  }

  /** Per-entity fact group keys for the avg-count-per-entity intent:
    * (fact table, "per <kw>") → grouping column on the fact. These are
    * the FK columns, so the two-level aggregate never joins. */
  private val perKeys: Map[(String, String), String] = Map(
    ("orders", "customer") -> "o_custkey",
    ("lineitem", "order") -> "l_orderkey",
    ("lineitem", "supplier") -> "l_suppkey",
    ("lineitem", "part") -> "l_partkey",
    ("events", "user") -> "user_id",
    ("documents", "source") -> "source",
    ("documents", "language") -> "lang")

  /** Average-count-per-entity: "average number of orders per customer" —
    * a two-level aggregate (COUNT per entity key, then AVG over the
    * per-entity counts). Distinct from the grouped-AVG intent ("average
    * order value by month" = one row per group); this answers with ONE
    * row. The counted noun is whitelisted (or introduced by "number
    * of"/"count of") so value phrasings like "average order value per
    * customer" never land here. Entities with zero fact rows don't
    * contribute a group — the same semantics as the reference's
    * AVG-over-GROUP-BY subquery answers. */
  private def extractAvgPerEntity(q: String): Option[Plan] = {
    val s = q.toLowerCase
    val explicit =
      "(?:average|avg|mean)\\s+(?:number|count)\\s+of\\s+([a-z ]+?)\\s+per\\s+([a-z ]+?)\\s*\\??\\s*$".r
    val bare =
      "(?:average|avg|mean)\\s+(orders|purchases|events|clicks|items|line items|shipments|documents)\\s+per\\s+([a-z ]+?)\\s*\\??\\s*$".r
    explicit.findFirstMatchIn(s).orElse(bare.findFirstMatchIn(s)).flatMap { m =>
      val fact = matchTable(m.group(1))
      val per = m.group(2).trim
      val keyOpt =
        if (Seq("year", "month", "day").exists(per.startsWith))
          dateCols.get(fact).map(dc =>
            if (per.startsWith("year")) s"year($dc)"
            else if (per.startsWith("month")) s"date_format($dc, 'yyyy-MM')"
            else s"date_format($dc, 'yyyy-MM-dd')")
        else perKeys.collectFirst {
          case ((f, kw), key) if f == fact && per.startsWith(kw) => key
        }
      keyOpt.map { key =>
        val (where, years, status, yearApplied, negated) =
          buildWhere(q, "aggregate", fact, Nil)
        val sql = s"SELECT round(AVG(n), 6) AS avg_n, COUNT(*) AS n_groups " +
          s"FROM (SELECT COUNT(*) AS n FROM $fact$where GROUP BY $key) t"
        Plan("avg_per_entity", fact, needsAggregation = true, limit = 100, sql,
          yearRange = years, statusFilter = status, groupDim = Some(per),
          yearApplied = yearApplied, negated = negated)
      }
    }
  }

  /** Date-extremum metric: "what is the earliest order date", "when was
    * the latest event" → MIN/MAX over the table's date column, one row.
    * Requires a date-ish cue (" date" or a "when ..." question) so
    * superlative LIST phrasings ("show the 10 newest orders") keep their
    * ORDER BY treatment in [[extractOrder]]. */
  private def extractDateMetric(q: String): Option[Plan] = {
    val s = q.toLowerCase
    val minCue = Seq("earliest", "oldest").exists(s.contains) ||
      "when\\s+was\\s+the\\s+first\\b".r.findFirstIn(s).isDefined
    val maxCue = Seq("latest", "newest", "most recent").exists(s.contains) ||
      "when\\s+was\\s+the\\s+last\\b".r.findFirstIn(s).isDefined
    val dateish = s.contains(" date") || s.startsWith("when ")
    if (!dateish || !(minCue ^ maxCue)) None
    else {
      val table = matchTable(q)
      dateCols.get(table).map { dc =>
        val (fn, alias) = if (minCue) ("MIN", "earliest") else ("MAX", "latest")
        val (where, years, status, yearApplied, negated) =
          buildWhere(q, "aggregate", table, Nil)
        val sql = s"SELECT $fn($dc) AS $alias FROM $table$where"
        Plan("date_metric", table, needsAggregation = true, limit = 100, sql,
          yearRange = years, statusFilter = status,
          yearApplied = yearApplied, negated = negated)
      }
    }
  }

  /** Superlative or explicit "ordered/sorted by" phrasing → deterministic
    * ORDER BY on the table's numeric, date, or name column, with the key
    * column as tie-break (reference corpus: "first 10 crimes ordered by
    * FIR date", questions.txt #3). */
  private def extractOrder(q: String, table: String): Option[String] = {
    val s = q.toLowerCase
    val key = keyCols.getOrElse(table, "1")
    val numDesc = Seq("most expensive", "highest", "largest", "biggest",
      "greatest", "most valuable", "priciest")
    val numAsc = Seq("cheapest", "least expensive", "lowest", "smallest")
    val dateDesc = Seq("newest", "latest", "most recent")
    val dateAsc = Seq("oldest", "earliest")
    def num = numericCols.get(table)
    def dt = dateCols.get(table)
    def nameCol = searchCols.get(table)
    val explicit = "(?:ordered|sorted|order)\\s+by\\s+(\\w+(?:\\s+date)?)".r
      .findFirstMatchIn(s).map(_.group(1))
    val desc = s.contains("descending") || s.contains(" desc")
    def dir(c: String) = if (desc) s"$c DESC, $key" else s"$c ASC, $key"
    explicit match {
      case Some(target) if target.endsWith("date") || target == "time" =>
        dt.map(dir)
      case Some(target) if Seq("value", "price", "amount", "worth", "total",
        "balance").exists(target.startsWith) => num.map(dir)
      case Some(target) if target.startsWith("name") => nameCol.map(dir)
      case _ =>
        if (numDesc.exists(s.contains)) num.map(c => s"$c DESC, $key")
        else if (numAsc.exists(s.contains)) num.map(c => s"$c ASC, $key")
        else if (dateDesc.exists(s.contains)) dt.map(c => s"$c DESC, $key")
        else if (dateAsc.exists(s.contains)) dt.map(c => s"$c ASC, $key")
        else None
    }
  }

  /** Top-k-per-group: "top 3 customers per nation" → rank entities inside
    * each dimension group by the entity's numeric column, keep rank<=k.
    * Returns (entity table, dim rule, k) when the phrasing and a join
    * path both resolve. */
  private def extractTopKGroup(q: String): Option[(String, DimRule, Int)] = {
    val s = q.toLowerCase
    for {
      m <- "top\\s+(\\d+)\\s+.*?\\b(?:per|in each|for each)\\s+(.+)$".r.findFirstMatchIn(s)
      d <- dims.find(dr => m.group(2).startsWith(dr.kw))
      // table-match on the text before the group clause so the dim noun
      // ("nation" in "per nation") cannot hijack the entity table
      entity = matchTable(s.substring(0, m.start(2)))
      if d.kw == "year" || d.kw == "month" || d.table == entity ||
        joinPaths.contains((entity, d.table))
    } yield (entity, d, intCapped(m.group(1), 1000000))
  }

  /** Global top-k by an aggregate metric: "top 3 customers by total
    * order value" → join the fact table, SUM its numeric column per
    * entity, rank, LIMIT k. When the metric phrase names no other table
    * ("top 5 suppliers by account balance") the entity's own numeric
    * column orders directly — no aggregation needed. */
  private def extractTopKBy(q: String): Option[(String, Option[String], Int)] = {
    val s = q.toLowerCase
    for {
      m <- "top\\s+(\\d+)\\s+([a-z ]+?)\\s+by\\s+(.+)$".r.findFirstMatchIn(s)
      if !"\\b(?:per|in each|for each)\\b".r.findFirstIn(s).isDefined
    } yield {
      val entity = matchTable(m.group(2))
      val metricPhrase = m.group(3)
      val factHits = for {
        (table, kws) <- tableKeywords.toSeq
        kw <- kws if metricPhrase.contains(kw)
      } yield (table, kw.length)
      val fact = if (factHits.isEmpty) None
        else Some(factHits.maxBy { case (t, len) => (len, t) }._1)
      (entity, fact.filter(f => f != entity && joinPaths.contains((entity, f))),
        intCapped(m.group(1), 1000000))
    }
  }

  private def planTopKBy(
      q: String, entity: String, fact: Option[String], k: Int): Plan = {
    val key = keyCols.getOrElse(entity, "1")
    fact match {
      case Some(f) =>
        val from = joinPaths((entity, f))
        val (where, years, status, yearApplied, negated) =
          buildWhere(q, "topk", entity, Seq(f))
        val name = searchCols.getOrElse(entity, key)
        val num = numericCols.getOrElse(f, "1")
        val sql = s"SELECT $key, $name, SUM($num) AS total FROM $from$where " +
          s"GROUP BY $key, $name ORDER BY total DESC, $key LIMIT $k"
        Plan("topk_by", entity, needsAggregation = true, limit = k, sql,
          yearRange = years, statusFilter = status, joined = Seq(f),
          yearApplied = yearApplied, negated = negated,
          orderBy = Some(s"total DESC, $key"))
      case None =>
        val (where, years, status, yearApplied, negated) =
          buildWhere(q, "topk", entity, Nil)
        val num = numericCols.getOrElse(entity, "1")
        val sql = s"SELECT * FROM $entity$where " +
          s"ORDER BY $num DESC, $key LIMIT $k"
        Plan("topk_by", entity, needsAggregation = false, limit = k, sql,
          yearRange = years, statusFilter = status,
          yearApplied = yearApplied, negated = negated,
          orderBy = Some(s"$num DESC, $key"))
    }
  }

  /** "which <dim> has the most <entity>" → grouped count (or sum for
    * highest/lowest) ordered, LIMIT 1. */
  private def extractWhichGroup(q: String)
      : Option[(DimRule, String, String, String)] = {
    val s = q.toLowerCase
    for {
      m <- ("which\\s+([a-z ]+?)\\s+has\\s+the\\s+" +
        "(most|fewest|least|highest|largest|lowest|smallest)\\b").r.findFirstMatchIn(s)
      d <- dims.find(dr => m.group(1).contains(dr.kw))
      entity = matchTable(s.substring(m.end))
      // time dims group any DATED entity; entity dims need ownership or
      // an FK path
      if (timeKw(d.kw) && dateCols.contains(entity)) ||
        d.table == entity || joinPaths.contains((entity, d.table))
    } yield {
      val sup = m.group(2)
      val metric = if (Seq("most", "fewest", "least").contains(sup)) "n" else "total"
      val dir = if (Seq("most", "highest", "largest").contains(sup)) "DESC" else "ASC"
      (d, entity, metric, dir)
    }
  }

  /** HAVING-filtered groups: "which segments have more than 300
    * customers" → grouped count filtered on the AGGREGATE (HAVING), not
    * on rows. The numeral is the having bound, so the WHERE assembly
    * here deliberately carries only date/status features — routing it
    * through the threshold extractor would leak "more than 300" into
    * the WHERE as a value filter and silently change the denominator. */
  private def extractHaving(q: String): Option[Plan] = {
    val s = q.toLowerCase
    for {
      m <- ("which\\s+([a-z ]+?)\\s+have\\s+" +
        "(more|fewer|less)\\s+than\\s+(\\d+)\\s+([a-z ]+)").r.findFirstMatchIn(s)
      // "-ies" plurals don't contain their "-y" singular ("priorities")
      d <- dims.find(dr => m.group(1).replaceAll("ies\\b", "y").contains(dr.kw))
      entity = matchTable(m.group(4))
      if (timeKw(d.kw) && dateCols.contains(entity)) ||
        d.table == entity || joinPaths.contains((entity, d.table))
    } yield {
      val from =
        if (timeKw(d.kw) || d.table == entity) entity
        else joinPaths((entity, d.table))
      val joined = if (from == entity) Nil else Seq(d.table)
      val op = if (m.group(2) == "more") ">" else "<"
      val days = extractDateRange(q)
      val years = if (days.isDefined) None else extractYearRange(q)
      val statusN = extractStatusFilterN(q, entity)
      val dc = (entity +: joined).flatMap(dateCols.get).headOption
      val dateCond = days.flatMap { case (a, b) =>
        dc.map(c => s"CAST($c AS DATE) BETWEEN DATE '$a' AND DATE '$b'")
      }.orElse(years.flatMap { case (a, b) =>
        dc.map(c => s"year($c) BETWEEN $a AND $b")
      })
      val conds = dateCond.toSeq ++ statusN.map(_._1).toSeq
      val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      // groupExpr for the same reason as planWhichGroup: "which months
      // have more than N orders" must group the formatted date, not the
      // time dims' empty raw col
      val g = groupExpr(d, entity)
      val sql = s"SELECT $g AS grp, COUNT(*) AS n FROM $from$where " +
        s"GROUP BY $g HAVING COUNT(*) $op ${m.group(3)}"
      Plan("having", entity, needsAggregation = true, limit = 100, sql,
        yearRange = years, statusFilter = statusN.map(_._1),
        groupDim = Some(d.kw), joined = joined,
        yearApplied = (years.isEmpty && days.isEmpty) || dateCond.isDefined,
        negated = statusN.exists(_._2))
    }
  }

  /** "share of <metric> by <dim>" / "what percentage of <entity> are
    * <status>" — proportions of a whole. Grouped shares divide by a
    * scalar-subquery grand total (compiles to a reused 1-row subquery
    * plan, never a cartesian or a window over one partition); filtered
    * percentages keep the predicate OUT of the WHERE and count it
    * conditionally, so the denominator stays the full population. */
  private def extractShare(q: String): Option[Plan] = {
    val s = q.toLowerCase
    val cues = Seq("share of", "percentage of", "percent of",
      "what percentage", "what percent", "proportion of")
    if (!cues.exists(s.contains)) return None
    val dim = extractGroupDim(q)
    dim match {
      case Some(d) =>
        val (table, from) = dimFactFrom(q, d)
        val joined = if (d.table == table || from == table) Nil else Seq(d.table)
        val (where, years, status, yearApplied, negated) =
          buildWhere(q, "aggregate", table, joined)
        val g = groupExpr(d, table)
        // value phrasings share the SUM; everything else shares the COUNT
        val byValue = Seq("revenue", "value", "worth", "spend", "balance",
          "size").exists(s.contains)
        val num = numericCols.getOrElse(table, "1")
        val metric = if (byValue) s"SUM($num)" else "COUNT(*)"
        val grand = s"SELECT $metric FROM $from$where"
        val sql = s"SELECT $g AS grp, COUNT(*) AS n, " +
          s"round($metric / ($grand), 6) AS share " +
          s"FROM $from$where GROUP BY $g"
        Some(Plan("share", table, needsAggregation = true, limit = 100, sql,
          yearRange = years, statusFilter = status, groupDim = Some(d.kw),
          joined = joined, yearApplied = yearApplied, negated = negated))
      case None =>
        val table = matchTable(q)
        extractStatusFilterN(q, table).map { case (pred, neg) =>
          // integer 100, not 100.0: a decimal literal drags Spark into
          // DECIMAL arithmetic while DuckDB stays DOUBLE — int*bigint /
          // bigint is double division in both engines
          val sql = s"SELECT COUNT(*) AS n, " +
            s"round(100 * SUM(CASE WHEN $pred THEN 1 ELSE 0 END) / COUNT(*), 4) AS pct " +
            s"FROM $table"
          Plan("share", table, needsAggregation = true, limit = 100, sql,
            statusFilter = Some(pred), negated = neg)
        }
    }
  }

  /** Statistical-metric intent: "median order value", "90th percentile
    * of order value", "standard deviation of account balance" —
    * optionally grouped ("by priority"). Exact percentile/median (the
    * aggregation state is group-size-bounded); stddev is the sample
    * standard deviation in both engines. Output rounding: percentiles
    * round(6) (interpolation of two exact values), stddev round(3)
    * (double accumulation noise ~1e-9 relative stays far inside the
    * step). */
  private def extractStatMetric(q: String): Option[Plan] = {
    val s = q.toLowerCase
    val pct = "(\\d{1,2})(?:th|st|nd|rd)\\s+percentile".r.findFirstMatchIn(s)
    val metric: Option[(String => String, String)] =
      if (s.contains("median"))
        Some((c: String) => s"round(percentile($c, 0.5D), 6)", "median_value")
      else if (pct.isDefined) {
        val p = pct.get.group(1).toInt
        // integer percent → exact decimal fraction literal ("0.9", "0.35")
        val frac = java.math.BigDecimal.valueOf(p.toLong)
          .divide(java.math.BigDecimal.valueOf(100)).stripTrailingZeros
          .toPlainString
        Some((c: String) => s"round(percentile($c, ${frac}D), 6)", s"p${p}_value")
      } else if (Seq("standard deviation", "stddev", "std dev").exists(s.contains))
        Some((c: String) => s"round(stddev($c), 3)", "stddev_value")
      else None
    metric.map { case (render, alias) =>
      val dim = extractGroupDim(q)
      val (table, from) = dim.map(dimFactFrom(q, _))
        .getOrElse { val t0 = matchTable(q); (t0, t0) }
      val joined = dim.toSeq.map(_.table).filter(t2 => t2 != table && from != table)
      val (where, years, status, yearApplied, negated) =
        buildWhere(q, "aggregate", table, joined)
      val num = numericCols.getOrElse(table, "1")
      val sql = dim match {
        case Some(d) =>
          val g = groupExpr(d, table)
          s"SELECT $g AS grp, COUNT(*) AS n, ${render(num)} AS $alias " +
            s"FROM $from$where GROUP BY $g"
        case None =>
          s"SELECT COUNT(*) AS n, ${render(num)} AS $alias FROM $from$where"
      }
      Plan("stat", table, needsAggregation = true, limit = 100, sql,
        yearRange = years, statusFilter = status, groupDim = dim.map(_.kw),
        joined = joined, yearApplied = yearApplied, negated = negated)
    }
  }

  /** Q4 — deterministic SQL generation for the supported intents. */
  /** Clarification early-exit — the reference planner's low-confidence
    * path (`chatbot/agents/nodes.py:103`, confidence gate `:797`): when a
    * question cannot be grounded, return a question back instead of
    * guessing a plan. */
  final case class Clarification(reason: String, suggestions: Seq[String])

  /** Deterministic confidence: a question grounds iff it names a known
    * entity (table keyword) or a known dimension. Empty input or a
    * question with neither early-exits to Clarification — matchTable's
    * "orders" fallback must never silently answer an off-domain question
    * (the reference refuses these rather than hallucinating a table). */
  def planOrClarify(q: String): Either[Clarification, Plan] = {
    val s = q.toLowerCase.trim
    lazy val hasEntity = tableKeywords.exists { case (_, kws) => kws.exists(s.contains) }
    // time words alone don't ground a question: "what is the weather
    // today" contains the derived dim "day" but names nothing to count
    lazy val hasDim = dims.exists(d => !timeKw(d.kw) && s.contains(d.kw))
    if (s.isEmpty)
      Left(Clarification("empty question",
        Seq("ask about orders, customers, parts, suppliers, events or documents")))
    else if (!hasEntity && !hasDim)
      Left(Clarification("could not identify a data entity in the question",
        tableKeywords.keys.toSeq.sorted))
    else Right(plan(q))
  }

  def plan(q: String): Plan = {
    extractStatMetric(q)
      .orElse(extractShare(q))
      .orElse(extractAvgPerEntity(q))
      .orElse(extractDateMetric(q))
      .orElse(extractTopKGroup(q).map { case (entity, d, k) =>
        planTopKGroup(q, entity, d, k)
      })
      .orElse(extractTopKBy(q).map { case (entity, fact, k) =>
        planTopKBy(q, entity, fact, k)
      })
      .orElse(extractWhichGroup(q).map { case (d, entity, metric, dir) =>
        planWhichGroup(q, d, entity, metric, dir)
      })
      .orElse(extractHaving(q))
      .getOrElse(planBasic(q))
  }

  /** WHERE clause assembly shared by all plan shapes. Returns the clause
    * plus the features that fed it, so the Plan can surface them. The
    * date column resolves on the primary table first, then on the joined
    * tables — a recognized range is surfaced as yearApplied=false rather
    * than silently dropped when no date column resolves at all. */
  private def buildWhere(
      q: String,
      intent: String,
      table: String,
      joinedTables: Seq[String]): (String, Option[(Int, Int)], Option[String], Boolean, Boolean) = {
    // day-precision phrasing wins over the year-only range (a question
    // like "between 01-02-1995 and 15-02-1995" also contains years the
    // year extractor would grab — and would widen the filter wrongly)
    val days = extractDateRange(q)
    val years = if (days.isDefined) None else extractYearRange(q)
    val statusN = extractStatusFilterN(q, table)
      .orElse(joinedTables.flatMap(t2 => extractStatusFilterN(q, t2)).headOption)
    val dateCol = (table +: joinedTables).flatMap(dateCols.get).headOption
    val dateCond = days.flatMap { case (a, b) =>
      dateCol.map(dc => s"CAST($dc AS DATE) BETWEEN DATE '$a' AND DATE '$b'")
    }.orElse(years.flatMap { case (a, b) =>
      dateCol.map(dc => s"year($dc) BETWEEN $a AND $b")
    })
    val searchCond =
      if (intent == "search")
        extractSearchTerm(q).flatMap(t0 =>
          searchCols.get(table).map(c => s"lower($c) LIKE '%$t0%'"))
      else None
    val thresholdCond = extractThresholdAmong(q, table +: joinedTables)
    val conds = dateCond.toSeq ++ statusN.map(_._1).toSeq ++
      searchCond.toSeq ++ thresholdCond.toSeq
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    (where, years, statusN.map(_._1),
      (years.isEmpty && days.isEmpty) || dateCond.isDefined,
      statusN.exists(_._2))
  }

  private def planTopKGroup(q: String, entity: String, d: DimRule, k: Int): Plan = {
    val from =
      if (d.kw == "year" || d.kw == "month" || d.table == entity) entity
      else joinPaths((entity, d.table))
    val joined = if (from == entity) Nil else Seq(d.table)
    val (where, years, status, yearApplied, negated) =
      buildWhere(q, "topk", entity, joined)
    val g = groupExpr(d, entity)
    val num = numericCols.getOrElse(entity, "1")
    val key = keyCols.getOrElse(entity, "1")
    val sql = s"SELECT * FROM (SELECT *, ROW_NUMBER() OVER " +
      s"(PARTITION BY $g ORDER BY $num DESC, $key) AS rnk " +
      s"FROM $from$where) ranked WHERE rnk <= $k"
    Plan("topk_group", entity, needsAggregation = false, limit = k, sql,
      yearRange = years, statusFilter = status, groupDim = Some(d.kw),
      joined = joined, yearApplied = yearApplied, negated = negated,
      orderBy = Some(s"$num DESC, $key"))
  }

  private def planWhichGroup(
      q: String, d: DimRule, entity: String, metric: String, dir: String): Plan = {
    val from =
      if (timeKw(d.kw) || d.table == entity) entity
      else joinPaths((entity, d.table))
    val joined = if (from == entity) Nil else Seq(d.table)
    val (where, years, status, yearApplied, negated) =
      buildWhere(q, "which", entity, joined)
    val num = numericCols.getOrElse(entity, "1")
    // groupExpr, not d.col: the derived time dims ("which year has the
    // most orders") carry an empty col and must resolve onto the
    // entity's date column
    val g = groupExpr(d, entity)
    val sql = s"SELECT $g AS grp, COUNT(*) AS n, SUM($num) AS total " +
      s"FROM $from$where GROUP BY $g ORDER BY $metric $dir, grp LIMIT 1"
    Plan("which_group", entity, needsAggregation = true, limit = 1, sql,
      yearRange = years, statusFilter = status, groupDim = Some(d.kw),
      joined = joined, yearApplied = yearApplied, negated = negated,
      orderBy = Some(s"$metric $dir"))
  }

  private def planBasic(q: String): Plan = {
    val intent = detectIntent(q)
    val limit = extractLimit(q)
    val aggish = intent == "aggregate" || intent == "count"
    val pair = if (aggish) extractDimPair(q) else None
    val dim =
      if (aggish && pair.isEmpty) extractGroupDim(q) else None
    val table = pair.map(_._3)
      .orElse(dim.map(d => dimFactFrom(q, d)._1)).getOrElse(matchTable(q))
    val secondary =
      if (dim.isEmpty && pair.isEmpty) detectSecondary(q, table) else None
    val from = pair.map(_._3)
      .orElse(dim.map(d => dimFactFrom(q, d)._2))
      .orElse(secondary.map(sec => joinPaths((table, sec))))
      .getOrElse(table)
    val (where, years, status, yearApplied, negated) =
      buildWhere(q, intent, table, secondary.toSeq)
    val order = extractOrder(q, table)

    // two-dim grouping shares the count/aggregate SELECT shapes below,
    // only the grouping list widens
    def groupList: Seq[(String, String)] = pair match {
      case Some((d1, d2, f)) =>
        Seq(groupExpr(d1, f) -> "grp1", groupExpr(d2, f) -> "grp2")
      case None => dim.toSeq.map(d => groupExpr(d, table) -> "grp")
    }

    val sql = intent match {
      case "count" if isDistinctCount(q) =>
        distinctCountSql(q, table, from, where)
      case "count" =>
        groupList match {
          case Seq() => s"SELECT COUNT(*) AS n FROM $from$where"
          case gs =>
            val sel = gs.map { case (g, a) => s"$g AS $a" }.mkString(", ")
            val grp = gs.map(_._1).mkString(", ")
            s"SELECT $sel, COUNT(*) AS n FROM $from$where GROUP BY $grp"
        }
      case "aggregate" =>
        val num = numericCols.getOrElse(table, "1")
        val (fn, alias) = extractMetric(q)
        groupList match {
          case Seq() =>
            s"SELECT COUNT(*) AS n, $fn($num) AS $alias FROM $from$where"
          case gs =>
            val sel = gs.map { case (g, a) => s"$g AS $a" }.mkString(", ")
            val grp = gs.map(_._1).mkString(", ")
            s"SELECT $sel, COUNT(*) AS n, $fn($num) AS $alias FROM $from$where GROUP BY $grp"
        }
      case _ =>
        // A LIMIT without ORDER BY returns an arbitrary subset once the
        // match set exceeds the cap — list/search plans always carry at
        // least the key column as a deterministic order (Spark executes
        // ORDER BY+LIMIT as TakeOrdered, not a global sort).
        val ob = order.map(o => s" ORDER BY $o")
          .orElse(keyCols.get(table).map(k => s" ORDER BY $k"))
          .getOrElse("")
        s"SELECT * FROM $from$where$ob LIMIT $limit"
    }
    Plan(intent, table, needsAggregation(q), limit, sql,
      yearRange = years, statusFilter = status,
      groupDim = pair.map { case (d1, d2, _) => s"${d1.kw}+${d2.kw}" }
        .orElse(dim.map(_.kw)),
      joined = secondary.toSeq,
      yearApplied = yearApplied, negated = negated, orderBy = order)
  }

  private def isDistinctCount(q: String): Boolean = {
    val s = q.toLowerCase
    Seq("different", "unique", "distinct").exists(s.contains)
  }

  /** Distinct-entity counts: "how many different brands" → the dim
    * column's cardinality over its owning table; without a dim keyword,
    * the matched table's key cardinality. The WHERE built for the
    * matched table only carries over when the FROM stays that table. */
  private def distinctCountSql(
      q: String, table: String, from: String, where: String): String = {
    val s = q.toLowerCase
    dims.filter(_.kw != "year").find(d => s.contains(d.kw)) match {
      case Some(d) if d.col.isEmpty =>
        // derived time dim ("how many different days/months"): distinct
        // formatted keys over the matched table's date column (fuzz-caught:
        // the raw d.col is empty for time dims → COUNT(DISTINCT ) otherwise)
        val (t2, from2) = dimFactFrom(q, d)
        val w2 = if (t2 == table) where else ""
        s"SELECT COUNT(DISTINCT ${groupExpr(d, t2)}) AS n FROM $from2$w2"
      case Some(d) if d.table != table =>
        s"SELECT COUNT(DISTINCT ${d.col}) AS n FROM ${d.table}"
      case Some(d) =>
        s"SELECT COUNT(DISTINCT ${d.col}) AS n FROM $from$where"
      case None =>
        s"SELECT COUNT(DISTINCT ${keyCols.getOrElse(table, "1")}) AS n FROM $from$where"
    }
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
