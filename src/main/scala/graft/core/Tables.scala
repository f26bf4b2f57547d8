package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Schemas are discovered from parquet footers at read time — the engine
  * never hardcodes them, mirroring the reference's information_schema-driven
  * dynamic schema discovery (`etl-crimes/etl_crimes.py:231-244`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark refuses natively.
    // Sessions set spark.sql.legacy.parquet.nanosAsLong=true; restore a
    // microsecond TimestampType here (DuckDB likewise truncates ns→us).
    // `ts div 1000` stays integral; `ts / 1000` promotes to double, whose
    // 256-ns ulp at 1.7e18 can truncate to the wrong microsecond.
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view for the SQL query surface. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
