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
  // Memoized read-back frames, set at write time with the write schema
  // pinned (VersionedState.writeRead): re-opening state with
  // spark.read.parquet costs a footer-inference job per call, and the
  // replay gates re-open fact/gold dozens of times per run.
  private var factDf: DataFrame = _
  private var goldDf: DataFrame = _

  /** Per-batch throughput/state metrics (SURVEY §2.11 A13 ≅
    * StreamingQueryListener progress): rows processed, keys touched, and
    * the maintained state sizes after each batch. Off by default — the
    * counts are extra actions the hot path should not pay unless asked.
    * State sizes come from the just-written parquet footers
    * (VersionedState.rowCount) — metadata, not a scan job. Oracle-gated
    * by st_metrics_parity. */
  private val metricsBuf =
    scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)]()

  private def record(batchId: Int, rowsIn: Long, keysTouched: Long): Unit =
    if (trackMetrics)
      metricsBuf += ((batchId, rowsIn, keysTouched,
        VersionedState.rowCount(spark, factPath(version)),
        VersionedState.rowCount(spark, goldPath(version))))

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
    factDf = VersionedState.writeRead(fact0, factPath(0))
    goldDf = VersionedState.writeRead(buildGold(factDf), goldPath(0))
    version = 0
    metricsBuf.clear()
    if (trackMetrics) {
      // batch 0 = init: rows_in is the seeded fact size, keys_touched its
      // distinct parents (== gold rows); both are footer metadata.
      val n = VersionedState.rowCount(spark, factPath(0))
      record(0, n, VersionedState.rowCount(spark, goldPath(0)))
    }
  }

  def fact: DataFrame = synchronized {
    if (factDf == null) factDf = spark.read.parquet(factPath(version))
    factDf
  }
  def gold: DataFrame = synchronized {
    if (goldDf == null) goldDf = spark.read.parquet(goldPath(version))
    goldDf
  }

  /** Resume from the latest fully-committed (fact AND gold) version on
    * disk; a torn version from a crash between the two writes is skipped. */
  def recover(): Int = synchronized {
    version = VersionedState.latestCommitted(workDir, Seq("fact", "gold"))
      .getOrElse(throw new IllegalStateException(
        s"no committed gold state under $workDir"))
    factDf = null; goldDf = null // re-open lazily from the recovered version
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
      // ONE job surfaces both counts the batch needs (row count for the
      // empty-batch gate, distinct-parent count for the refresh's
      // adaptive join budget + metrics) instead of two.
      val hdr = batch.agg(count(lit(1)), count_distinct(col(parentKey))).head()
      val rowsIn = hdr.getLong(0)
      if (rowsIn == 0) return
      val nKeys = hdr.getLong(1)
      val prevFact = fact
      val prevGold = gold
      val keys = batch.select(col(parentKey)).distinct()
      val next = version + 1
      val newFact = VersionedState.writeRead(
        prevFact.join(keys, Seq(parentKey), "left_anti")
          .unionByName(batch.select(prevFact.columns.map(col): _*)),
        factPath(next))
      val newGold = VersionedState.writeRead(
        GoldIncremental.refresh(prevGold, keys, parentKey, Some(nKeys)) { ks =>
          buildGold(newFact.join(ks, Seq(parentKey), "left_semi"))
        }, goldPath(next))
      factDf = newFact
      goldDf = newGold
      version = next
      if (trackMetrics) record(next, rowsIn, nKeys)
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
