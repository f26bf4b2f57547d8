package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.ql.{Planner, QueryGuard}

/** Oracle-gated query-surface checks (SURVEY.md §2.10 Q1–Q7).
  *
  * Each entry drives the WHOLE reference chatbot path deterministically —
  * NL question → intent/feature extraction → SQL generation
  * (`chatbot/agents/intelligent_query_planner.py:102-345`) → static
  * validation + guarded execution
  * (`chatbot/security/query_validator.py:49-299`,
  * `postgres_executor.py:22-99`) — and the DuckDB oracle is an
  * independently hand-written statement of what the question MEANS, so a
  * wrong plan (wrong filter, wrong join, wrong grouping, dropped
  * negation) fails the differential gate rather than just a unit spec.
  *
  * Determinism rules for the gated set: every LIMIT rides a total ORDER
  * BY with a unique key tie-break (the planner emits those), or the
  * result is provably under the cap at both audited scales; double SUMs
  * that cross the engine boundary are stabilized with round(2) on BOTH
  * sides (error bound for these sums is ~1e-9 relative — far inside the
  * rounding step), while MAX/COUNT/passthrough doubles compare bit-exact.
  */
object QlQueries {

  /** Run a question through plan → guard → execute. maxRows is lifted
    * above every gated result size so the guard's defensive row cap
    * never truncates a deterministic answer. */
  private def ask(s: SparkSession, dir: String, question: String): DataFrame =
    QueryGuard.execute(s, dir, Planner.plan(question).sql, maxRows = 1000000)
      .fold(d => throw new IllegalStateException(
        s"planner SQL denied for '$question': ${d.reason}"), identity)

  private def planned(
      name: String,
      doc: String,
      question: String,
      oracle: String)(post: DataFrame => DataFrame = identity): QueryDef =
    QueryDef(name, s"$doc [NL: “$question”]", Some(oracle)) {
      (s, dir) => post(ask(s, dir, question))
    }

  val defs: Seq[QueryDef] = Seq(

    // ---- Q1/Q3: count intent with a year-range filter --------------------
    planned(
      "ql_count_year",
      "NL count + in-YYYY range (questions.txt count category)",
      "how many orders were placed in 1996",
      "SELECT COUNT(*) AS n FROM orders WHERE year(o_orderdate) = 1996")(),

    // ---- Q3: day-precision date range ------------------------------------
    planned(
      "ql_count_day_range",
      "NL count + DD-MM-YYYY day range (questions.txt date category)",
      "how many orders between 01-02-1995 and 15-02-1995",
      """SELECT COUNT(*) AS n FROM orders
         WHERE CAST(o_orderdate AS DATE)
           BETWEEN DATE '1995-02-01' AND DATE '1995-02-15'""")(),

    // ---- Q3: status negation ---------------------------------------------
    planned(
      "ql_negation_count",
      "NL negated status filter ('not finished' must NOT count F rows)",
      "how many orders are not finished",
      "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus <> 'F'")(),

    // ---- Q1: grouped count -----------------------------------------------
    planned(
      "ql_grouped_count",
      "NL grouped count by a dimension keyword",
      "count of orders by priority",
      "SELECT o_orderpriority AS grp, COUNT(*) AS n FROM orders GROUP BY 1")(),

    // ---- Q1: distinct-entity count ---------------------------------------
    planned(
      "ql_distinct_count",
      "NL distinct-cardinality count resolved onto the dim's owning table",
      "how many different segments are there",
      "SELECT COUNT(DISTINCT c_mktsegment) AS n FROM customer")(),

    // ---- Q2/Q3: FK-join aggregate with metric selection -------------------
    planned(
      "ql_join_agg_max",
      "NL aggregate with MAX metric over a 3-table FK join",
      "maximum order value by nation",
      """SELECT n_name AS grp, COUNT(*) AS n, MAX(o_totalprice) AS max_value
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""")(),

    // ---- top-k by aggregate metric (join + SUM + rank) ---------------------
    planned(
      "ql_topk_by_join",
      "NL global top-k entities by a joined fact-table SUM",
      "top 5 customers by order total",
      """SELECT c_custkey, c_name, round(SUM(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY SUM(o_totalprice) DESC, c_custkey LIMIT 5""")(
      // double SUM crosses the engine boundary: stabilize to cents on
      // both sides (ordering uses the raw sum in both engines)
      _.withColumn("total", round(col("total"), 2))),

    // ---- which-group superlative -------------------------------------------
    planned(
      "ql_which_group",
      "NL 'which <dim> has the most <entity>' superlative, tie-broken",
      "which nation has the most customers",
      """SELECT n_name AS grp, COUNT(*) AS n, round(SUM(c_acctbal), 2) AS total
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY COUNT(*) DESC, grp LIMIT 1""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- top-k-per-group window ---------------------------------------------
    planned(
      "ql_topk_per_group",
      "NL top-k rows inside each dimension group via ROW_NUMBER",
      "top 2 orders per priority",
      """SELECT * FROM (
           SELECT *, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) ranked
         WHERE rnk <= 2""")(
      // Spark's row_number is INT, DuckDB's BIGINT — align the rank type
      _.withColumn("rnk", col("rnk").cast("long"))),

    // ---- search intent -------------------------------------------------------
    planned(
      "ql_search_like",
      "NL search with sanitized LIKE term (result under the row cap)",
      "find nations called nation",
      "SELECT * FROM nation WHERE lower(n_name) LIKE '%nation%'")(),

    // ---- ordered list with explicit sort + exclusive 'after' ------------------
    planned(
      "ql_list_ordered",
      "NL ordered list: explicit sort column, exclusive 'after YYYY', LIMIT",
      "first 20 orders placed after 1997 ordered by order date",
      """SELECT * FROM orders WHERE year(o_orderdate) >= 1998
         ORDER BY o_orderdate ASC, o_orderkey LIMIT 20""")(),

    // ---- numeric threshold filter -----------------------------------------
    planned(
      "ql_threshold_count",
      "NL numeric threshold bound to the primary table's amount column",
      "how many orders over 200000",
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 200000")(),

    // ---- AVG metric grouped by derived year dimension ----------------------
    planned(
      "ql_avg_by_year",
      "NL AVG metric grouped by the derived year dimension",
      "average order value by year",
      """SELECT year(o_orderdate) AS grp, COUNT(*) AS n,
                round(AVG(o_totalprice), 4) AS avg_value
         FROM orders GROUP BY year(o_orderdate)""")(
      _.withColumn("avg_value", round(col("avg_value"), 4))),

    // ---- MIN metric, ungrouped ---------------------------------------------
    planned(
      "ql_min_metric",
      "NL MIN metric selection on the matched table's numeric column",
      "minimum account balance of customers",
      "SELECT COUNT(*) AS n, MIN(c_acctbal) AS min_value FROM customer")(),

    // ---- single-day date filter ---------------------------------------------
    planned(
      "ql_on_day",
      "NL single-day 'on DD-MM-YYYY' filter",
      "how many orders on 27-02-1995",
      """SELECT COUNT(*) AS n FROM orders
         WHERE CAST(o_orderdate AS DATE)
           BETWEEN DATE '1995-02-27' AND DATE '1995-02-27'""")(),

    // ---- ISO day range on the events stream table -----------------------------
    planned(
      "ql_events_day_range",
      "NL ISO-format day range resolved onto the events timestamp",
      "how many events between 2024-01-05 and 2024-01-15",
      """SELECT COUNT(*) AS n FROM events
         WHERE CAST(ts AS DATE)
           BETWEEN DATE '2024-01-05' AND DATE '2024-01-15'""")(),

    // ---- which-group superlative on a SUM metric --------------------------------
    planned(
      "ql_which_priority",
      "NL 'which <dim> has the highest <amount>' — SUM metric, DESC, tie-broken",
      "which priority has the highest order value",
      """SELECT o_orderpriority AS grp, COUNT(*) AS n,
                round(SUM(o_totalprice), 2) AS total
         FROM orders GROUP BY o_orderpriority
         ORDER BY SUM(o_totalprice) DESC, grp LIMIT 1""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- distinct count over an FK join with year filter --------------------------
    planned(
      "ql_distinct_join_year",
      "NL distinct-entity count across an FK join with a year filter",
      "how many unique customers with orders in 1997",
      """SELECT COUNT(DISTINCT c_name) AS n
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE year(o_orderdate) = 1997""")(),

    // ---- grouped count by a dim owned by the matched table -------------------------
    planned(
      "ql_grouped_by_segment",
      "NL grouped count on the matched table's own dimension",
      "count of customers by segment",
      "SELECT c_mktsegment AS grp, COUNT(*) AS n FROM customer GROUP BY 1")(),

    // ---- THREE constraints in one question: status + group-by + year range ---
    planned(
      "ql_composed_status_year_group",
      "NL triple composition: status filter + per-year grouping + year range in one question",
      "how many finished orders per year between 1995 and 1997",
      """SELECT year(o_orderdate) AS grp, COUNT(*) AS n FROM orders
         WHERE o_orderstatus = 'F' AND year(o_orderdate) BETWEEN 1995 AND 1997
         GROUP BY 1""")(),

    // ---- negation composed with a year filter ------------------------------
    planned(
      "ql_negation_year",
      "NL negated status composed with a year filter",
      "how many orders that are not finished were placed in 1996",
      """SELECT COUNT(*) AS n FROM orders
         WHERE NOT (o_orderstatus = 'F') AND year(o_orderdate) = 1996""")(),

    // ---- top-k by joined SUM composed with an inclusive 'since' filter ------
    planned(
      "ql_topk_by_join_year",
      "NL top-k by joined fact SUM composed with an inclusive since-year filter",
      "top 5 customers by order total since 1996",
      """SELECT c_custkey, c_name, round(SUM(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE year(o_orderdate) >= 1996
         GROUP BY c_custkey, c_name
         ORDER BY SUM(o_totalprice) DESC, c_custkey LIMIT 5""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- which-group superlative in the ASC (fewest) direction --------------
    planned(
      "ql_which_segment_fewest",
      "NL 'which <own-dim> has the fewest <entity>' — COUNT metric, ASC direction",
      "which segment has the fewest customers",
      """SELECT c_mktsegment AS grp, COUNT(*) AS n,
                round(SUM(c_acctbal), 2) AS total
         FROM customer GROUP BY c_mktsegment
         ORDER BY COUNT(*) ASC, grp LIMIT 1""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- numeric threshold composed with a year filter -----------------------
    planned(
      "ql_threshold_year",
      "NL numeric threshold composed with an in-year filter",
      "how many orders over 300000 placed in 1997",
      """SELECT COUNT(*) AS n FROM orders
         WHERE o_totalprice > 300000 AND year(o_orderdate) = 1997""")(),

    // ---- relative date range pinned to the deterministic anchor ---------------
    planned(
      "ql_events_last_days",
      "NL relative 'last N days' range resolved against the pinned anchor date",
      "how many events in the last 30 days",
      """SELECT COUNT(*) AS n FROM events
         WHERE CAST(ts AS DATE)
           BETWEEN DATE '2001-07-02' AND DATE '2001-08-01'""")(),

    // ---- grouped count on the documents table -------------------------------
    planned(
      "ql_docs_by_language",
      "NL grouped count on the corpus table (documents dimension rules)",
      "count documents by language",
      "SELECT lang AS grp, COUNT(*) AS n FROM documents GROUP BY lang")(),

    // ---- joined SUM grouped by a two-hop dimension --------------------------
    planned(
      "ql_revenue_by_nation",
      "NL joined SUM through the orders→customer→nation two-hop path",
      "total revenue by nation",
      """SELECT n_name AS grp, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- own-table SUM grouped by an own dimension --------------------------
    planned(
      "ql_balance_by_segment",
      "NL own-table SUM grouped by the customer's own segment dimension",
      "sum of balances by segment",
      """SELECT c_mktsegment AS grp, COUNT(*) AS n,
                round(SUM(c_acctbal), 2) AS total
         FROM customer GROUP BY c_mktsegment""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- FOUR constraints: join + group + status + since-year ---------------
    planned(
      "ql_open_value_by_nation_year",
      "NL quadruple composition: joined SUM + nation grouping + open-status filter + inclusive since-year",
      "total value by nation for open orders since 1996",
      """SELECT n_name AS grp, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderstatus = 'O' AND year(o_orderdate) >= 1996
         GROUP BY n_name""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- top-k-per-group through a joined dimension -------------------------
    planned(
      "ql_topk_customers_per_nation",
      "NL top-k rows per JOINED dimension group (window over a join)",
      "top 3 customers per nation",
      """SELECT * FROM (
           SELECT *, ROW_NUMBER() OVER (
             PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
           FROM customer JOIN nation ON c_nationkey = n_nationkey) ranked
         WHERE rnk <= 3""")(),

    // ---- top-k rows by an own numeric column --------------------------------
    planned(
      "ql_topk_suppliers_balance",
      "NL top-k raw rows ordered by the entity's own numeric column",
      "top 5 suppliers by account balance",
      """SELECT * FROM supplier
         ORDER BY s_acctbal DESC, s_suppkey LIMIT 5""")(),

    // ---- grouped count on the event log --------------------------------------
    planned(
      "ql_events_by_type",
      "NL grouped count over the event log's type dimension",
      "count of events by event type",
      "SELECT event_type AS grp, COUNT(*) AS n FROM events GROUP BY event_type")(),

    // ---- AVG metric grouped by a corpus dimension -----------------------------
    planned(
      "ql_avg_size_by_source",
      "NL AVG metric on the corpus table grouped by provenance",
      "average document size by source",
      """SELECT source AS grp, COUNT(*) AS n,
                round(AVG(n_chars), 4) AS avg_value
         FROM documents GROUP BY source""")(
      _.withColumn("avg_value", round(col("avg_value"), 4))),

    // ---- top-k documents by the corpus numeric column --------------------------
    planned(
      "ql_topk_docs_by_length",
      "NL top-k raw corpus rows by document length",
      "top 3 documents by length",
      """SELECT * FROM documents
         ORDER BY n_chars DESC, doc_id LIMIT 3""")(),

    // ---- event-type category filter composed with a month range ---------------
    planned(
      "ql_events_clicks_month",
      "NL event-category filter composed with an 'in <month> YYYY' range on ts",
      "how many click events in january 2024",
      """SELECT COUNT(*) AS n FROM events
         WHERE CAST(ts AS DATE)
           BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'
           AND event_type = 'click'""")(),

    // ---- negated event-category filter ------------------------------------------
    planned(
      "ql_events_not_click",
      "NL negated category on the event log ('not click' must NOT count clicks)",
      "how many events are not click",
      "SELECT COUNT(*) AS n FROM events WHERE NOT (event_type = 'click')")(),

    // ---- AVG metric grouped by the event-type dimension --------------------------
    planned(
      "ql_avg_value_by_event_type",
      "NL AVG metric on the event log grouped by its type dimension",
      "average value by event type",
      """SELECT event_type AS grp, COUNT(*) AS n,
                round(AVG(value), 4) AS avg_value
         FROM events GROUP BY event_type""")(
      _.withColumn("avg_value", round(col("avg_value"), 4))),

    // ---- which-group superlative on the event log ---------------------------------
    planned(
      "ql_which_event_type",
      "NL 'which <dim> has the most <entity>' on the event log, tie-broken",
      "which event type has the most events",
      """SELECT event_type AS grp, COUNT(*) AS n, round(SUM(value), 2) AS total
         FROM events GROUP BY event_type
         ORDER BY COUNT(*) DESC, grp LIMIT 1""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- which-group superlative on the corpus table -------------------------------
    planned(
      "ql_which_language",
      "NL 'which <dim> has the most <entity>' on the corpus table (exact long SUM)",
      "which language has the most documents",
      """SELECT lang AS grp, COUNT(*) AS n,
                CAST(SUM(n_chars) AS BIGINT) AS total
         FROM documents GROUP BY lang
         ORDER BY COUNT(*) DESC, grp LIMIT 1""")(),

    // ---- event-category filter composed with a numeric threshold --------------------
    planned(
      "ql_events_threshold",
      "NL event-category filter composed with a numeric threshold on value",
      "how many purchase events over 400",
      """SELECT COUNT(*) AS n FROM events
         WHERE event_type = 'purchase' AND value > 400""")(),

    // ---- top-k events by the log's own numeric column --------------------------------
    planned(
      "ql_topk_events_by_value",
      "NL top-k raw event rows by the log's own numeric column",
      "top 5 events by value",
      """SELECT * FROM events
         ORDER BY value DESC, event_id LIMIT 5""")(),

    // ---- top-k-per-group window over the event log --------------------------------------
    planned(
      "ql_events_topk_per_type",
      "NL top-k rows inside each event-type group via ROW_NUMBER",
      "top 2 events per event type",
      """SELECT * FROM (
           SELECT *, ROW_NUMBER() OVER (
             PARTITION BY event_type
             ORDER BY value DESC, event_id) AS rnk
           FROM events) ranked
         WHERE rnk <= 2""")(
      _.withColumn("rnk", col("rnk").cast("long"))),

    // ---- distinct-cardinality count resolved onto the corpus dim's owner -------------
    planned(
      "ql_docs_distinct_sources",
      "NL distinct-cardinality question resolved onto the documents table",
      "how many unique sources are there",
      "SELECT COUNT(DISTINCT source) AS n FROM documents")(),

    // ---- single-day DD-MM-YYYY filter on the event timestamp -------------------------
    planned(
      "ql_events_on_day",
      "NL single-day 'on DD-MM-YYYY' filter resolved onto the events timestamp",
      "how many events on 15-01-2024",
      """SELECT COUNT(*) AS n FROM events
         WHERE CAST(ts AS DATE)
           BETWEEN DATE '2024-01-15' AND DATE '2024-01-15'""")(),

    // ---- search intent over the corpus text column -------------------------------------
    planned(
      "ql_docs_search_dup",
      "NL search with sanitized LIKE term over the corpus text; the planner's default key order makes the LIMIT deterministic at every scale",
      "find documents about dup",
      """SELECT * FROM documents WHERE lower(text) LIKE '%dup%'
         ORDER BY doc_id LIMIT 100""")(),

    // ---- explicit 'ordered by time' list on the event log -------------------------------
    planned(
      "ql_events_list_ordered",
      "NL ordered list: explicit time sort resolved onto ts, LIMIT from 'first N'",
      "first 10 events ordered by time",
      """SELECT * FROM events
         ORDER BY ts ASC, event_id LIMIT 10""")(),

    // ---- month dimension derived from the date column -----------------------------------
    planned(
      "ql_orders_per_month",
      "NL grouped count by the derived MONTH dimension composed with a year filter",
      "count of orders by month in 1996",
      """SELECT strftime(o_orderdate, '%Y-%m') AS grp, COUNT(*) AS n
         FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1""")(),

    // ---- AVG metric grouped by month -----------------------------------------------------
    planned(
      "ql_avg_value_by_month",
      "NL AVG metric grouped by the derived month dimension with a year filter",
      "average order value by month in 1997",
      """SELECT strftime(o_orderdate, '%Y-%m') AS grp, COUNT(*) AS n,
                round(AVG(o_totalprice), 4) AS avg_value
         FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1""")(
      _.withColumn("avg_value", round(col("avg_value"), 4))),

    // ---- share-of-total: grouped count share ----------------------------------------------
    planned(
      "ql_share_by_segment",
      "NL share-of-total: per-segment count share of the whole population (scalar-subquery grand total, no cartesian, no one-partition window)",
      "share of customers by segment",
      """SELECT c_mktsegment AS grp, COUNT(*) AS n,
                round(COUNT(*) / (SELECT COUNT(*) FROM customer), 6) AS share
         FROM customer GROUP BY c_mktsegment""")(),

    // ---- share-of-total: joined SUM share ---------------------------------------------------
    planned(
      "ql_share_revenue_by_nation",
      "NL share-of-total on a joined SUM metric: each nation's fraction of total revenue",
      "share of revenue by nation",
      """SELECT n_name AS grp, COUNT(*) AS n,
                round(SUM(o_totalprice) /
                  (SELECT SUM(o_totalprice)
                   FROM orders JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey), 6) AS share
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""")(),

    // ---- filtered percentage: predicate OUT of the WHERE ------------------------------------
    planned(
      "ql_pct_open_orders",
      "NL filtered percentage: open orders as a share of ALL orders (the predicate counts conditionally, never filters the denominator)",
      "what percentage of orders are open",
      """SELECT COUNT(*) AS n,
                round(100 * SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                      / COUNT(*), 4) AS pct
         FROM orders""")(),

    // ---- share-of-total on the corpus table ---------------------------------------------------
    planned(
      "ql_docs_share_by_language",
      "NL share-of-total: per-language count share of the corpus",
      "share of documents by language",
      """SELECT lang AS grp, COUNT(*) AS n,
                round(COUNT(*) / (SELECT COUNT(*) FROM documents), 6) AS share
         FROM documents GROUP BY lang""")(),

    // ---- avg-count-per-entity: two-level aggregate, no join -----------------------------------
    planned(
      "ql_avg_orders_per_customer",
      "NL average-count-per-entity: COUNT per FK key, then AVG over the counts (two-phase aggregate, never a join)",
      "average number of orders per customer",
      """SELECT round(AVG(n), 6) AS avg_n, COUNT(*) AS n_groups
         FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_custkey) t""")(),

    // ---- avg-count-per-entity on the event log -------------------------------------------------
    planned(
      "ql_avg_events_per_user",
      "NL average events per user: per-user counts averaged into one row",
      "average number of events per user",
      """SELECT round(AVG(n), 6) AS avg_n, COUNT(*) AS n_groups
         FROM (SELECT COUNT(*) AS n FROM events GROUP BY user_id) t""")(),

    // ---- avg-count-per-entity, bare phrasing ---------------------------------------------------
    planned(
      "ql_avg_items_per_order",
      "NL bare 'average <entities> per <entity>' phrasing resolved onto the lineitem fact",
      "average items per order",
      """SELECT round(AVG(n), 6) AS avg_n, COUNT(*) AS n_groups
         FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey) t""")(),

    // ---- date-extremum metric ------------------------------------------------------------------
    planned(
      "ql_earliest_order_date",
      "NL date-extremum: MIN over the table's date column, one row",
      "what is the earliest order date",
      "SELECT MIN(o_orderdate) AS earliest FROM orders")(),

    // ---- date-extremum on the event timestamp --------------------------------------------------
    planned(
      "ql_latest_event_time",
      "NL 'when was the latest <entity>' resolved to MAX over the event timestamp",
      "when was the latest event",
      "SELECT MAX(ts) AS latest FROM events")(),

    // ---- two-dimension grouping ----------------------------------------------------------------
    planned(
      "ql_count_by_status_year",
      "NL two-dim grouped count: 'by <dim1> and <dim2>' widens the GROUP BY on one fact scan",
      "count of orders by status and year",
      """SELECT o_orderstatus AS grp1, year(o_orderdate) AS grp2, COUNT(*) AS n
         FROM orders GROUP BY 1, 2""")(),

    // ---- two-dimension grouping on the corpus table --------------------------------------------
    planned(
      "ql_docs_by_lang_source",
      "NL two-dim grouped count over two entity dims owned by one table",
      "count of documents by language and source",
      """SELECT lang AS grp1, source AS grp2, COUNT(*) AS n
         FROM documents GROUP BY 1, 2""")(),

    // ---- two-dimension grouping: entity dim + derived month ------------------------------------
    planned(
      "ql_events_by_type_month",
      "NL two-dim grouped count mixing an entity dim with the derived month dim",
      "count of events by event type and month",
      """SELECT event_type AS grp1, strftime(ts, '%Y-%m') AS grp2, COUNT(*) AS n
         FROM events GROUP BY 1, 2""")(),

    // ---- HAVING: aggregate-filtered groups -----------------------------------------------------
    planned(
      "ql_having_segments",
      "NL HAVING intent: the numeral filters the AGGREGATE, never the rows",
      "which segments have more than 300 customers",
      """SELECT c_mktsegment AS grp, COUNT(*) AS n
         FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > 300""")(),

    // ---- HAVING over a join dimension ----------------------------------------------------------
    planned(
      "ql_having_nations",
      "NL HAVING over the customer->nation join dimension",
      "which nations have more than 60 customers",
      """SELECT n_name AS grp, COUNT(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name HAVING COUNT(*) > 60""")(),

    // ---- numeric BETWEEN range -----------------------------------------------------------------
    planned(
      "ql_value_between",
      "NL numeric BETWEEN on the table's value column (non-year numbers stay a value range, 4-digit years stay a date range)",
      "how many orders between 50000 and 150000",
      """SELECT COUNT(*) AS n FROM orders
         WHERE o_totalprice BETWEEN 50000 AND 150000""")(),

    // ---- numeric BETWEEN on the event log ------------------------------------------------------
    planned(
      "ql_events_value_between",
      "NL numeric BETWEEN bound to the event log's value column",
      "count events with value between 100 and 200",
      """SELECT COUNT(*) AS n FROM events
         WHERE value BETWEEN 100 AND 200""")(),

    // ---- statistical metrics: median -----------------------------------------------------------
    planned(
      "ql_median_value",
      "NL exact median of the table's value column (percentile, not approx)",
      "what is the median order value",
      """SELECT COUNT(*) AS n, round(quantile_cont(o_totalprice, 0.5), 6) AS median_value
         FROM orders""")(),

    // ---- statistical metrics: grouped percentile -----------------------------------------------
    planned(
      "ql_p90_by_priority",
      "NL Nth-percentile metric grouped by a dimension keyword",
      "90th percentile of order value by priority",
      """SELECT o_orderpriority AS grp, COUNT(*) AS n,
                round(quantile_cont(o_totalprice, 0.9), 6) AS p90_value
         FROM orders GROUP BY 1""")(),

    // ---- statistical metrics: standard deviation with a year filter ----------------------------
    planned(
      "ql_stddev_filtered",
      "NL sample standard deviation composed with the year-range filter",
      "standard deviation of order value in 1996",
      """SELECT COUNT(*) AS n, round(stddev(o_totalprice), 3) AS stddev_value
         FROM orders WHERE year(o_orderdate) = 1996""")(),

    // ---- statistical metrics on the event log ---------------------------------------------------
    planned(
      "ql_median_events_by_type",
      "NL grouped median over the event stream's value column",
      "median event value by event type",
      """SELECT event_type AS grp, COUNT(*) AS n,
                round(quantile_cont(value, 0.5), 6) AS median_value
         FROM events GROUP BY 1""")(),

    // ---- statistical metrics on the corpus table ------------------------------------------------
    planned(
      "ql_p75_docs_by_language",
      "NL grouped percentile over the corpus size column",
      "75th percentile of documents by language",
      """SELECT lang AS grp, COUNT(*) AS n,
                round(quantile_cont(n_chars, 0.75), 6) AS p75_value
         FROM documents GROUP BY 1""")(),

    // ---- derived DAY dimension -----------------------------------------------------------------
    planned(
      "ql_events_per_day",
      "NL grouped count over the derived calendar-day dimension (string day keys, engine-dtype-stable)",
      "count of events by day",
      """SELECT strftime(ts, '%Y-%m-%d') AS grp, COUNT(*) AS n
         FROM events GROUP BY 1""")(),

    // ---- derived DAY dimension composed with a category filter ---------------------------------
    planned(
      "ql_clicks_per_day",
      "NL day grouping composed with an event-category filter",
      "count of click events by day",
      """SELECT strftime(ts, '%Y-%m-%d') AS grp, COUNT(*) AS n
         FROM events WHERE event_type = 'click' GROUP BY 1""")(),

    // ---- distinct count over a derived time dim (fuzz-caught path) -----------------------------
    planned(
      "ql_distinct_days",
      "NL distinct-cardinality count over the derived day dimension",
      "how many different days have events",
      "SELECT COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS n FROM events")(),

    // ---- which-group superlative over a derived time dim ---------------------------------------
    planned(
      "ql_which_year",
      "NL 'which year has the most orders' — the time dim resolves through groupExpr (the raw dim col is empty)",
      "which year has the most orders",
      """SELECT CAST(year(o_orderdate) AS INT) AS grp, COUNT(*) AS n,
                round(SUM(o_totalprice), 2) AS total
         FROM orders GROUP BY 1 ORDER BY COUNT(*) DESC, grp LIMIT 1""")(
      _.withColumn("total", round(col("total"), 2))),

    // ---- HAVING over a derived time dim --------------------------------------------------------
    planned(
      "ql_having_months",
      "NL HAVING over the derived month dimension",
      "which months have more than 100 orders",
      """SELECT strftime(o_orderdate, '%Y-%m') AS grp, COUNT(*) AS n
         FROM orders GROUP BY 1 HAVING COUNT(*) > 100""")(),

    // ---- qlx: the DENIAL side of the surface -----------------------------
    // The reference does not only answer: its validator rejects threats
    // with a threat level (query_validator.py:49-299) and its planner
    // early-exits to clarification on ungroundable intent (nodes.py:103,
    // confidence :797). These gates assert the REFUSALS byte-for-byte:
    // each case actually runs through QueryGuard.validate / planOrClarify
    // and the oracle is the expected policy table as VALUES literals — a
    // policy regression (keyword slips through, literal wrongly blocked,
    // off-domain question silently planned) breaks the hash.
    QueryDef(
      "qlx_guard_denials",
      "SQL threat-policy truth table: DML/DDL, multi-statement, comment tricks, bare forbidden keywords all Denied with threat level; keyword-inside-string-literal and plain SELECT stay allowed",
      Some("""
        SELECT * FROM (VALUES
          ('block_comment',     'denied',  'comments are not allowed', 'medium'),
          ('comment_trick',     'denied',  'comments are not allowed', 'medium'),
          ('ddl_drop',          'denied',  'only SELECT/WITH statements are allowed', 'high'),
          ('dml_insert',        'denied',  'only SELECT/WITH statements are allowed', 'high'),
          ('dml_update',        'denied',  'only SELECT/WITH statements are allowed', 'high'),
          ('empty_statement',   'denied',  'empty statement', 'low'),
          ('keyword_in_body',   'denied',  'forbidden keyword: delete', 'high'),
          ('literal_is_safe',   'allowed', '', 'none'),
          ('multi_statement',   'denied',  'multi-statement input is not allowed', 'high'),
          ('plain_select_safe', 'allowed', '', 'none'),
          ('with_merge',        'denied',  'forbidden keyword: merge', 'high')
        ) AS t(case_name, outcome, reason, threat)
      """)) { (s, dir) =>
      import s.implicits._
      val cases = Seq(
        "block_comment" -> "SELECT /* hidden */ 1",
        "comment_trick" -> "SELECT * FROM orders -- DROP TABLE orders",
        "ddl_drop" -> "DROP TABLE orders",
        "dml_insert" -> "INSERT INTO orders VALUES (1)",
        "dml_update" -> "UPDATE orders SET o_orderstatus = 'F'",
        "empty_statement" -> "   ",
        "keyword_in_body" -> "SELECT * FROM orders WHERE delete",
        "literal_is_safe" -> "SELECT 'drop table orders; delete from x' AS s FROM nation",
        "multi_statement" -> "SELECT 1; DROP TABLE orders",
        "plain_select_safe" -> "SELECT 1 AS one",
        "with_merge" -> "WITH x AS (SELECT 1) SELECT merge FROM x")
      cases.map { case (n, sql) =>
        QueryGuard.validate(sql) match {
          case Left(d) => (n, "denied", d.reason, d.threat)
          case Right(_) => (n, "allowed", "", "none")
        }
      }.toDF("case_name", "outcome", "reason", "threat")
    },

    QueryDef(
      "qlx_clarify",
      "Clarification truth table: empty/off-domain questions early-exit to a clarification object (reason + suggestion count) instead of a guessed plan; grounded questions plan with the right intent",
      Some("""
        SELECT * FROM (VALUES
          ('empty',          'clarify', 'empty question', CAST(1 AS BIGINT)),
          ('greeting',       'clarify', 'could not identify a data entity in the question', CAST(8 AS BIGINT)),
          ('grounded_count', 'planned', 'count', CAST(0 AS BIGINT)),
          ('grounded_dim',   'planned', 'topk_by', CAST(0 AS BIGINT)),
          ('grounded_search','planned', 'search', CAST(0 AS BIGINT)),
          ('no_entity',      'clarify', 'could not identify a data entity in the question', CAST(8 AS BIGINT)),
          ('whitespace',     'clarify', 'empty question', CAST(1 AS BIGINT))
        ) AS t(case_name, outcome, detail, n_suggestions)
      """)) { (s, dir) =>
      import s.implicits._
      val cases = Seq(
        "empty" -> "",
        "greeting" -> "hello there, how are you",
        "grounded_count" -> "how many orders in 1996",
        "grounded_dim" -> "top 3 nations by orders",
        "grounded_search" -> "find customers named smith",
        "no_entity" -> "what is the weather today",
        "whitespace" -> "   ")
      cases.map { case (n, q) =>
        Planner.planOrClarify(q) match {
          case Left(c) => (n, "clarify", c.reason, c.suggestions.size.toLong)
          case Right(p) => (n, "planned", p.intent, 0L)
        }
      }.toDF("case_name", "outcome", "detail", "n_suggestions")
    })
}
