package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.search.IndexMaintain

/** Streaming inverted-index maintenance: document micro-batches (new
  * docs and whole-document updates; one row per doc_id per batch) drive
  * [[IndexMaintain.refresh]] via foreachBatch — each batch touches only
  * its own vocabulary, so the per-batch cost tracks the batch, not the
  * corpus.
  *
  * State lives in parquet (versioned postings + index tables), same as
  * [[FunnelMaintainer]]/[[GoldMaintainer]]: no pinned executor memory,
  * restart-safe, drops onto a transactional table format unchanged.
  */
final class IndexMaintainer(spark: SparkSession, workDir: String) {

  private var version = 0
  // Memoized schema-pinned read-back frames (VersionedState.writeRead):
  // a bare spark.read.parquet pays a footer-inference job per call.
  private var postingsDf: DataFrame = _
  private var indexDf: DataFrame = _
  private def postingsPath(v: Int) = s"$workDir/postings_v$v"
  private def indexPath(v: Int) = s"$workDir/index_v$v"

  def init(docs0: DataFrame): Unit = synchronized {
    VersionedState.dropVersions(workDir, "postings", "index")
    postingsDf = VersionedState.writeRead(
      IndexMaintain.postings(docs0), postingsPath(0), compact = true)
    indexDf = VersionedState.writeRead(
      IndexMaintain.buildIndex(postingsDf), indexPath(0), compact = true)
    version = 0
  }

  def postingsState: DataFrame = synchronized {
    if (postingsDf == null) postingsDf = spark.read.parquet(postingsPath(version))
    postingsDf
  }
  def index: DataFrame = synchronized {
    if (indexDf == null) indexDf = spark.read.parquet(indexPath(version))
    indexDf
  }

  /** Resume from the latest fully-committed (postings AND index) version
    * on disk — a restarted maintainer continues where the crashed one
    * stopped; a torn version (postings written, index not) is skipped. */
  def recover(): Int = synchronized {
    version = VersionedState.latestCommitted(workDir, Seq("postings", "index"))
      .getOrElse(throw new IllegalStateException(
        s"no committed index state under $workDir"))
    postingsDf = null; indexDf = null // re-open from the recovered version
    version
  }

  /** One micro-batch of documents(doc_id, text): splice postings, refresh
    * only the touched terms' index rows. */
  def applyBatch(batch: DataFrame): Unit = synchronized {
    if (batch.isEmpty) return
    val delta = batch.select(col("doc_id"), col("text"))
    val next = version + 1
    // the postings write happens INSIDE refresh (materialize hook): the
    // index recompute and the returned state frame both read the written
    // table, so the splice chain runs once per batch instead of three times
    val (p1, i1) = IndexMaintain.refresh(postingsState, index, delta,
      materializePostings = p => VersionedState.writeRead(p, postingsPath(next), compact = true))
    val newPostings = p1
    val newIndex = VersionedState.writeRead(i1, indexPath(next), compact = true)
    postingsDf = newPostings
    indexDf = newIndex
    version = next
  }

  def start(docs: DataFrame, queryName: String): StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
      .start()
}
