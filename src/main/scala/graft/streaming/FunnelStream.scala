package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.gold.GoldIncremental

/** Streaming maintenance of the w15 ordered-funnel state: per-user
  * first-view / first-qualifying-click / first-qualifying-purchase
  * timestamps, kept current as events stream in.
  *
  * Why not `flatMapGroupsWithState`: the funnel cascade is NOT
  * prefix-monotone under out-of-order arrival. A late 'view' with an
  * EARLIER timestamp can re-qualify a click that a running-state
  * update already discarded — correct incremental state would have to
  * buffer every event per user anyway. So the maintainer keeps the
  * event log (append-only, as event logs are) and recomputes the
  * cascade ONLY for users touched by each micro-batch, splicing their
  * rows into the standing funnel table — O(touched users' history) per
  * batch, never a full recompute, and byte-equal to the batch cascade
  * by construction. At cluster scale the log is bucketed by user_id so
  * the touched-user semi-join prunes to their buckets.
  *
  * State lives in parquet (append-only log + versioned funnel table),
  * same as [[GoldMaintainer]]: no pinned executor memory, drops onto a
  * transactional table format unchanged.
  */
final class FunnelMaintainer(spark: SparkSession, workDir: String) {

  private var version = 0
  private def logPath = s"$workDir/events_log"
  private def funnelPath(v: Int) = s"$workDir/funnel_v$v"

  /** The w15 cascade at per-user grain: t1 = first view, t2 = first
    * click strictly after t1, t3 = first purchase strictly after t2;
    * users without a view have no row, later steps are null until
    * reached. Every stage keys on user_id — one partitioning serves
    * the whole cascade. */
  def cascade(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"), col("event_type"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
  }

  def init(events0: DataFrame): Unit = synchronized {
    VersionedState.dropVersions(workDir, "funnel")
    events0.write.mode("overwrite").parquet(logPath)
    cascade(spark.read.parquet(logPath))
      .write.mode("overwrite").parquet(funnelPath(0))
    version = 0
  }

  def eventLog: DataFrame = spark.read.parquet(logPath)
  def funnel: DataFrame = spark.read.parquet(funnelPath(version))

  /** Resume from the latest committed funnel version on disk (the event
    * log is append-only — parquet appends are file-atomic — so only the
    * funnel table is versioned). */
  def recover(): Int = synchronized {
    version = VersionedState.latestCommitted(workDir, Seq("funnel"))
      .getOrElse(throw new IllegalStateException(
        s"no committed funnel state under $workDir"))
    version
  }

  /** One micro-batch: append the events, recompute the cascade for the
    * touched users only, splice their funnel rows. */
  def applyBatch(batch: DataFrame): Unit = synchronized {
    if (batch.isEmpty) return
    val cols = eventLog.columns
    batch.select(cols.map(col).toIndexedSeq: _*)
      .write.mode("append").parquet(logPath)
    val keys = batch.select(col("user_id")).distinct()
    val log = spark.read.parquet(logPath)
    val next = version + 1
    GoldIncremental.refresh(funnel, keys, "user_id") { ks =>
      cascade(log.join(ks, Seq("user_id"), "left_semi"))
    }.write.mode("overwrite").parquet(funnelPath(next))
    version = next
  }

  def start(events: DataFrame, queryName: String): StreamingQuery =
    events.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
      .start()
}
