package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.DocPipeline
import graft.resolve.LshBands

/** Streaming NEAR-dup admission: document micro-batches probe a standing
  * MinHash-LSH index and each doc is labeled `near_dup` (best verified
  * match in the index, jacc-then-min-id tiebreak) or `new` — the
  * streaming twin of the batch dd116 query, sharing its banding and
  * verification code through [[LshBands]] so the two surfaces cannot
  * drift.
  *
  * Semantics are admit-all/label-all: every batch doc is ADMITTED into
  * the index after labeling (labels drive downstream filtering), so a
  * doc's decision depends only on strictly-earlier batches. That makes
  * the whole replay equal to ONE stratified batch query — the
  * `st_lsh_admission_parity` oracle states it in SQL — where
  * reject-on-dup semantics would be an order-dependent fixpoint no
  * one-shot query could express.
  *
  * State lives in versioned parquet (bands + shingles + sizes tables),
  * same as [[IndexMaintainer]]/[[GoldMaintainer]]: no pinned executor
  * memory, restart-safe via [[VersionedState]], drops onto a
  * transactional table format unchanged. Per-batch cost: the batch's
  * shingle/banding pass + a band-key equi-join into the standing bands
  * (stored band-bucketed at scale, so the probe co-locates) +
  * verification joins pruned to band-collision candidates — the
  * standing corpus is never pairwise-compared and never reshuffled.
  */
final class LshAdmitMaintainer(spark: SparkSession, workDir: String,
                               threshold: Double = 0.4) {

  private val Prefixes = Seq("bands", "shingles", "sizes", "decisions")
  private var version = 0
  // Memoized schema-pinned read-back frames per state table
  // (VersionedState.writeRead): a bare spark.read.parquet pays a
  // footer-inference job per call, and every batch re-opens all four.
  private val stateDf = scala.collection.mutable.HashMap[String, DataFrame]()
  private def path(prefix: String, v: Int) = s"$workDir/${prefix}_v$v"
  private def state(prefix: String): DataFrame = synchronized {
    stateDf.getOrElseUpdate(prefix, spark.read.parquet(path(prefix, version)))
  }

  /** Shingle array (cached: three consumers), bands, exploded shingles,
    * sizes — caller unpersists the first element after its writes. */
  private def parts(docs: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val arr = DocPipeline.shingleArr(docs).cache()
    (arr, LshBands.bandsOf(arr),
      arr.select(col("doc_id"), explode(col("shArr")).as("sh")),
      arr.select(col("doc_id"), size(col("shArr")).cast("long").as("n")))
  }

  private def emptyDecisions: DataFrame =
    spark.sql("""SELECT CAST(NULL AS BIGINT) AS doc_id, '' AS status,
                        CAST(NULL AS BIGINT) AS match_id,
                        CAST(NULL AS DOUBLE) AS jacc""").limit(0)

  def init(docs0: DataFrame): Unit = synchronized {
    VersionedState.dropVersions(workDir, Prefixes: _*)
    val (arr, b0, sh0, n0) = parts(docs0.select(col("doc_id"), col("text")))
    stateDf("bands") = VersionedState.writeRead(b0, path("bands", 0))
    stateDf("shingles") = VersionedState.writeRead(sh0, path("shingles", 0))
    stateDf("sizes") = VersionedState.writeRead(n0, path("sizes", 0))
    stateDf("decisions") =
      VersionedState.writeRead(emptyDecisions, path("decisions", 0))
    arr.unpersist(blocking = false)
    version = 0
  }

  def bands: DataFrame = state("bands")
  def shinglesState: DataFrame = state("shingles")
  def sizes: DataFrame = state("sizes")

  /** Cumulative decisions for every doc streamed since init (init docs
    * seed the index and carry no decision). */
  def decisions: DataFrame = state("decisions")

  /** Resume from the latest version where ALL FOUR state tables
    * committed; a torn version (crash between writes) is skipped. */
  def recover(): Int = synchronized {
    version = VersionedState.latestCommitted(workDir, Prefixes)
      .getOrElse(throw new IllegalStateException(
        s"no committed LSH-admission state under $workDir"))
    stateDf.clear() // re-open lazily from the recovered version
    version
  }

  /** One micro-batch of documents(doc_id, text): label every doc against
    * the standing index, then admit the whole batch. Intra-batch
    * near-dups are NOT matched against each other (strictly-earlier
    * semantics — within a batch there is no order). */
  def applyBatch(batch: DataFrame): Unit = synchronized {
    if (batch.isEmpty) return
    val (dArr, dBands, dSh, dN) = parts(batch.select(col("doc_id"), col("text")))
    val sBands = bands
    val cand = dBands.as("d").join(sBands.as("s"),
        col("d.band_idx") === col("s.band_idx") && col("d.bkey") === col("s.bkey"))
      .select(col("d.doc_id").as("d_id"), col("s.doc_id").as("s_id"))
      .distinct()
    val verified = LshBands.verify(cand, dSh, shinglesState, dN, sizes, threshold)
    val best = verified.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("d_id").orderBy(col("jacc").desc, col("s_id").asc)))
      .filter(col("rk") === 1)
    val batchDecisions = batch.select(col("doc_id"))
      .join(best.select(col("d_id").as("doc_id"), col("s_id").as("match_id"),
        col("jacc")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("match_id").isNull, "new").otherwise("near_dup").as("status"),
        col("match_id"), col("jacc"))
    val next = version + 1
    // every next-version table derives from version `version` reads plus
    // the batch — versioned paths keep the reads and writes disjoint
    val newState = Map(
      "decisions" -> VersionedState.writeRead(
        decisions.unionByName(batchDecisions), path("decisions", next)),
      "bands" -> VersionedState.writeRead(
        sBands.unionByName(dBands), path("bands", next)),
      "shingles" -> VersionedState.writeRead(
        shinglesState.unionByName(dSh), path("shingles", next)),
      "sizes" -> VersionedState.writeRead(
        sizes.unionByName(dN), path("sizes", next)))
    stateDf.clear()
    stateDf ++= newState
    dArr.unpersist(blocking = false)
    version = next
  }

  def start(docs: DataFrame, queryName: String): StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
      .start()
}
