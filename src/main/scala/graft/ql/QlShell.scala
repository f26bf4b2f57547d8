package graft.ql

import org.apache.spark.sql.SparkSession

import graft.functions.Udfs

/** CLI face of the query surface: validate + execute one SQL statement
  * over the registered testdata views.
  * Usage: runMain graft.ql.QlShell <sfDir> <sql> [maxRows]
  */
object QlShell {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sql = args(1)
    val maxRows = args.lift(2).map(_.toInt).getOrElse(100)
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
        println(res.columns.mkString(" | "))
        res.rows.foreach(r => println(r.mkString(" | ")))
      case Left(denied) =>
        println(s"DENIED [${denied.threat}]: ${denied.reason}")
        sys.exit(2)
    }
    spark.stop()
  }
}
