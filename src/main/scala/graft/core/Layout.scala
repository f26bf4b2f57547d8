package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB target (SURVEY.md §4):
  * date-partitioned silver writes (partition pruning replaces the
  * reference's date indexes), bucketed tables for shuffle-free FK joins
  * (replaces its FK btree lookups), and key salting for skew.
  */
object Layout {

  /** Write a silver table partitioned by year-month of `tsCol` — scans
    * with a date predicate prune to the matching partitions only
    * (PartitionFilters in the plan), the Spark analog of the reference's
    * `COALESCE(date_modified, date_created)` index. */
  def writePartitionedByMonth(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("part_month").parquet(path)

  /** Persist both sides bucketed on the join key: subsequent equi-joins
    * between them are exchange-free (no shuffle in the plan). */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Salt a skewed key into `salts` subkeys; the dimension side is
    * exploded across all salts so the join stays an equi-join
    * (SURVEY §4: mega-case crime_id skew). The salt hashes the WHOLE
    * row, never the key alone — a key-derived salt maps every row of
    * the hot key to the same subkey and spreads nothing. */
  def saltKey(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(struct(df.columns.map(col): _*)), lit(salts)))
      .withColumn("__salted_key", concat_ws("#", col(key), col("__salt")))

  def explodeDimForSalt(dim: DataFrame, key: String, salts: Int): DataFrame =
    dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
      .withColumn("__salted_key", concat_ws("#", col(key), col("__salt")))
}
