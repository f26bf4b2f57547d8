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

  // Memoize the loaded DataFrame per (session, dir, table): the object
  // holds only the analyzed plan (no data), but building it costs a file
  // listing + parquet footer read — a fixed driver-side job that a
  // 157-query inventory otherwise pays hundreds of times over.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
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

  /** Register every table as a temp view for the SQL query surface.
    * Idempotent per (session, dir): re-registration only happens when the
    * requested dir CHANGES for a session (views must then be replaced),
    * so back-to-back guarded queries pay the view setup once. */
  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerAll(spark: SparkSession, dir: String): Unit =
    if (lastDir.put(spark, dir) != dir)
      all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
