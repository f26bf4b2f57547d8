package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the engine's query inventory.
  *
  * @param name   stable key; prefixed with the SURVEY.md §2 operator id it
  *               demonstrates (e.g. "j5_corr_agg").
  * @param doc    one-line description.
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None → the driver records a weaker
  *               rows-only check (used for ops DuckDB can't express).
  * @param run    the Spark implementation; second arg is the sf directory.
  */
final case class QueryDef(
    name: String,
    doc: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)
