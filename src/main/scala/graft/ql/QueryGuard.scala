package graft.ql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Interactive query surface (SURVEY.md §2.10 Q5/Q6): the reference's
  * NL→SQL chatbot validates generated SQL before execution
  * (`chatbot/security/query_validator.py:49-299`) and executes with a
  * statement timeout and row cap (`postgres_executor.py:22-99`). The
  * LLM planner stays external; this is the deterministic guard +
  * executor over the registered table views.
  */
object QueryGuard {

  final case class Denied(reason: String, threat: String)

  private val ForbiddenKeywords = Seq(
    "insert", "update", "delete", "drop", "create", "alter", "truncate",
    "grant", "revoke", "merge", "call", "set", "refresh", "msck", "analyze")

  /** Strip string literals so keyword scanning can't be confused by
    * SELECT 'drop table' — mirrors the reference's sanitizer. */
  private def withoutLiterals(sql: String): String =
    sql.replaceAll("'([^']|'')*'", "''")

  /** Q5 — static validation: single read-only SELECT/WITH statement, no
    * DDL/DML keywords, no comment tricks. */
  def validate(sql: String): Either[Denied, String] = {
    val trimmed = sql.trim
    val scan = withoutLiterals(trimmed.toLowerCase)
    if (trimmed.isEmpty)
      Left(Denied("empty statement", "low"))
    else if (!(scan.startsWith("select") || scan.startsWith("with")))
      Left(Denied("only SELECT/WITH statements are allowed", "high"))
    else if (scan.contains("--") || scan.contains("/*"))
      Left(Denied("comments are not allowed", "medium"))
    else if (scan.stripSuffix(";").contains(";"))
      Left(Denied("multi-statement input is not allowed", "high"))
    else
      ForbiddenKeywords.find(k => s"\\b$k\\b".r.findFirstIn(scan).isDefined) match {
        case Some(k) => Left(Denied(s"forbidden keyword: $k", "high"))
        case None => Right(trimmed.stripSuffix(";"))
      }
  }

  /** Q6 — capped executor over the registered testdata views. The row
    * cap mirrors the chatbot's default LIMIT 100. NOTE: this returns a
    * lazy DataFrame and enforces only the row cap; for the statement
    * timeout (the reference's `statement_timeout`), use [[run]], which
    * owns the action. */
  def execute(
      spark: SparkSession,
      dir: String,
      sql: String,
      maxRows: Int = 100): Either[Denied, DataFrame] =
    validate(sql).map { cleaned =>
      Tables.registerAll(spark, dir)
      spark.sql(cleaned).limit(maxRows)
    }

  /** Collected result: field names ride along so callers (the shell) can
    * print a header without re-touching the DataFrame. */
  final case class RunResult(columns: Array[String], rows: Array[org.apache.spark.sql.Row])

  /** Q6 — guarded COLLECTING executor with a statement timeout, mirroring
    * the reference's postgres executor (statement_timeout + row cap).
    * Runs the action inside a job group; on timeout the whole group is
    * cancelled so no tasks leak, and the caller gets a Denied instead of
    * a hung shell. A cancellation flag is checked after the job group is
    * registered and before the action, so a future that starts only
    * after the caller already timed out never submits work (the
    * setJobGroup/cancelJobGroup race on a saturated pool). Runtime
    * failures (analysis errors, task failures) map to Denied instead of
    * escaping as raw exceptions.
    */
  def run(
      spark: SparkSession,
      dir: String,
      sql: String,
      maxRows: Int = 100,
      timeout: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.Duration(60, "s")): Either[Denied, RunResult] = {
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.control.NonFatal
    val analyzed =
      try execute(spark, dir, sql, maxRows)
      catch {
        case NonFatal(e) =>
          Left(Denied(s"analysis failed: ${firstLine(e.getMessage)}", "low"))
      }
    analyzed.flatMap { df =>
      val group = s"graft-ql-${java.util.UUID.randomUUID()}"
      val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
      val fut = Future {
        spark.sparkContext.setJobGroup(group, sql.take(120), interruptOnCancel = true)
        try {
          if (cancelled.get())
            throw new java.util.concurrent.CancellationException("timed out before start")
          RunResult(df.columns, df.collect())
        } finally spark.sparkContext.clearJobGroup()
      }
      try Right(Await.result(fut, timeout))
      catch {
        case _: TimeoutException =>
          cancelled.set(true)
          spark.sparkContext.cancelJobGroup(group)
          Left(Denied(s"statement timeout after ${timeout.toSeconds}s", "medium"))
        case NonFatal(e) =>
          Left(Denied(s"execution failed: ${firstLine(e.getMessage)}", "low"))
      }
    }
  }

  private def firstLine(s: String): String =
    Option(s).map(_.takeWhile(_ != '\n')).getOrElse("(no message)")
}
