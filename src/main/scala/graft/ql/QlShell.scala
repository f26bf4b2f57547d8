package graft.ql

import org.apache.spark.sql.SparkSession

import graft.functions.Udfs

/** CLI face of the query surface: validate + execute one SQL statement
  * over the registered testdata views — or, with --ask, the full NL
  * path (planner → guard → executor), the engine-side shape of the
  * reference's chatbot loop.
  * Usage: runMain graft.ql.QlShell <sfDir> <sql> [maxRows]
  *        runMain graft.ql.QlShell <sfDir> --ask '<question>' [maxRows]
  * Add --present anywhere to render record cards + statistics
  * (Presenter) instead of pipe-separated rows.
  */
object QlShell {
  def main(rawArgs: Array[String]): Unit = {
    val presentMode = rawArgs.contains("--present")
    val args = rawArgs.filterNot(_ == "--present")
    val dir = args(0)
    val (sql, maxRowsArg) =
      if (args(1) == "--ask") {
        val plan = Planner.plan(args(2))
        println(s"-- intent=${plan.intent} table=${plan.table}" +
          plan.groupDim.map(d => s" group=$d").getOrElse("") +
          (if (plan.yearRange.isDefined && !plan.yearApplied) " (year range NOT applied)" else ""))
        println(s"-- ${plan.sql}")
        (plan.sql, args.lift(3).map(_.toInt).getOrElse(plan.limit))
      } else (args(1), args.lift(2).map(_.toInt).getOrElse(100))
    val maxRows = maxRowsArg
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Udfs.register(spark)
    QueryGuard.run(spark, dir, sql, maxRows) match {
      case Right(res) =>
        if (presentMode) {
          print(Presenter.present(res.columns.toSeq,
            res.rows.toSeq.map(_.toSeq)))
        } else {
          println(res.columns.mkString(" | "))
          res.rows.foreach(r => println(r.mkString(" | ")))
        }
      case Left(denied) =>
        println(s"DENIED [${denied.threat}]: ${denied.reason}")
        sys.exit(2)
    }
    spark.stop()
  }
}
