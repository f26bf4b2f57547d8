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
    * `COALESCE(date_modified, date_created)` index.
    *
    * Rows are clustered on the partition value before the write: without
    * it every write task emits a sliver into EVERY month (tasks × months
    * files — at 1000 executors and 84 months, ~84k files per write), and
    * the listing/footer overhead of the tiny files costs more than the
    * pruning saves (measured: the unclustered layout LOST 2.5× to the
    * flat scan at 10×; see LayoutBench). `filesPerMonth` spreads a month
    * across that many writers when one 128 MiB-ish file per month is not
    * enough — size it ≈ month_bytes / 128 MiB at the target scale. */
  /** @param sortCols sort rows on these columns WITHIN each month's
    *   files (round-10: the Pipeline default is month-partitioned +
    *   sorted silver): parquet min-max row-group stats on the sort keys
    *   then prune key-bounded scans inside a month the way the partition
    *   value prunes across months. */
  def writePartitionedByMonth(df: DataFrame, tsCol: String, path: String,
      filesPerMonth: Int = 1, sortCols: Seq[String] = Nil): Unit = {
    require(filesPerMonth >= 1, s"filesPerMonth must be >= 1: $filesPerMonth")
    val d = df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
    val clustered =
      if (filesPerMonth == 1) d.repartition(col("part_month"))
      else d.repartition(col("part_month"),
        pmod(hash(struct(df.columns.map(col): _*)), lit(filesPerMonth)))
    val sorted =
      if (sortCols.isEmpty) clustered
      else clustered.sortWithinPartitions(
        (col("part_month") +: sortCols.map(col)): _*)
    sorted.write.mode("overwrite").partitionBy("part_month").parquet(path)
  }

  /** Date-bounded predicate for a month-partitioned table: the row-level
    * `tsCol` bounds PLUS the covering `part_month` partition filter —
    * partition pruning needs the partition column in the predicate (Spark
    * does not derive `part_month` bounds from `tsCol` bounds; without
    * this the scan lists and reads every month and the layout buys
    * nothing — measured in LayoutBench). Dates as 'yyyy-MM-dd…' strings;
    * end is exclusive, its month inclusive (a range ending mid-month
    * still needs that month's partition). */
  def monthBounded(tsCol: String, startInclusive: String,
      endExclusive: String): org.apache.spark.sql.Column =
    col("part_month") >= startInclusive.substring(0, 7) &&
      col("part_month") <= endExclusive.substring(0, 7) &&
      col(tsCol) >= startInclusive && col(tsCol) < endExclusive

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
