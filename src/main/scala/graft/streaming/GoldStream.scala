package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.gold.GoldIncremental

/** Streaming incremental MV maintenance (SURVEY.md §3.2 + §4): the
  * reference rebuilds its gold MVs wholesale on a schedule; here a
  * Structured Streaming `foreachBatch` sink applies each micro-batch of
  * fact deltas as a changed-key splice — O(touched parents) per batch,
  * never a full rebuild.
  *
  * Batch contract: a micro-batch carries the FULL new child set for
  * every parent it touches (the child-replace S8 semantics — the
  * reference's ingestion emits whole parents, not row diffs).
  *
  * State lives in versioned parquet directories and is read back after
  * every write: no pinned executor memory, lineage truncated at each
  * batch boundary, and the same pattern drops onto a transactional
  * table format (Delta/Iceberg MERGE) unchanged at cluster scale.
  */
final class GoldMaintainer(
    spark: SparkSession,
    parentKey: String,
    workDir: String,
    buildGold: DataFrame => DataFrame,
    trackMetrics: Boolean = false) {

  private var version = 0

  /** Per-batch throughput/state metrics (SURVEY §2.11 A13 ≅
    * StreamingQueryListener progress): rows processed, keys touched, and
    * the maintained state sizes after each batch. Off by default — the
    * counts are extra actions (parquet-footer metadata reads, but still
    * jobs) the hot path should not pay unless asked. Oracle-gated by
    * st_metrics_parity. */
  private val metricsBuf =
    scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)]()

  private def record(batchId: Int, rowsIn: Long, keysTouched: Long): Unit =
    if (trackMetrics)
      metricsBuf += ((batchId, rowsIn, keysTouched, fact.count(), gold.count()))

  /** (batch_id, rows_in, keys_touched, state_rows, gold_rows) per applied
    * batch, init included as batch 0. */
  def metrics: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    metricsBuf.toSeq
      .toDF("batch_id", "rows_in", "keys_touched", "state_rows", "gold_rows")
  }

  private def factPath(v: Int) = s"$workDir/fact_v$v"
  private def goldPath(v: Int) = s"$workDir/gold_v$v"

  /** Seed v0 from the initial fact state; builds the initial gold. */
  def init(fact0: DataFrame): Unit = synchronized {
    VersionedState.dropVersions(workDir, "fact", "gold")
    fact0.write.mode("overwrite").parquet(factPath(0))
    buildGold(spark.read.parquet(factPath(0)))
      .write.mode("overwrite").parquet(goldPath(0))
    version = 0
    metricsBuf.clear()
    if (trackMetrics) {
      val n = fact.count()
      record(0, n, gold.count())
    }
  }

  def fact: DataFrame = spark.read.parquet(factPath(version))
  def gold: DataFrame = spark.read.parquet(goldPath(version))

  /** Resume from the latest fully-committed (fact AND gold) version on
    * disk; a torn version from a crash between the two writes is skipped. */
  def recover(): Int = synchronized {
    version = VersionedState.latestCommitted(workDir, Seq("fact", "gold"))
      .getOrElse(throw new IllegalStateException(
        s"no committed gold state under $workDir"))
    version
  }

  /** One micro-batch: child-replace the touched parents in the fact
    * state, then splice ONLY those parents' recomputed gold rows. */
  def applyBatch(batch0: DataFrame): Unit = synchronized {
    // persist the micro-batch ONCE: the splice reads it several times
    // (key set, fact union, metrics), and an un-cached foreachBatch frame
    // re-scans its source on every action — measured 5× the input rows
    // in the listener's numInputRows before this cache
    val batch = batch0.persist()
    try {
      val rowsIn = batch.count()
      if (rowsIn == 0) return
      val prevFact = fact
      val prevGold = gold
      val keys = batch.select(col(parentKey)).distinct()
      val next = version + 1
      prevFact.join(keys, Seq(parentKey), "left_anti")
        .unionByName(batch.select(prevFact.columns.map(col): _*))
        .write.mode("overwrite").parquet(factPath(next))
      val newFact = spark.read.parquet(factPath(next))
      GoldIncremental.refresh(prevGold, keys, parentKey) { ks =>
        buildGold(newFact.join(ks, Seq(parentKey), "left_semi"))
      }.write.mode("overwrite").parquet(goldPath(next))
      version = next
      if (trackMetrics) record(next, rowsIn, keys.count())
    } finally batch.unpersist(blocking = false)
  }

  /** Attach to a streaming delta source; each micro-batch maintains the
    * gold table incrementally. */
  def start(deltas: DataFrame, queryName: String): StreamingQuery =
    deltas.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
      .start()
}
