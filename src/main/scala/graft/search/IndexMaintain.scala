package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental inverted-index maintenance — the index-side analog of
  * `gold/GoldIncremental`: when a delta batch of documents arrives (new
  * docs and whole-document updates), refresh the term index touching
  * only the TERMS the delta mentions, never rebuilding the
  * corpus-wide aggregate.
  *
  * State grain: the (term, doc, tf) postings table — the same relation
  * `ir1_inverted_index` aggregates. Maintenance is two delta-bounded
  * steps:
  *
  *   1. postings splice: drop the replaced docs' rows (broadcast anti
  *      join — the base NEVER shuffles), append the delta's rows;
  *   2. term-stats splice: recompute the index rows ONLY for affected
  *      terms (any term in a removed or added posting — semi-joined from
  *      the spliced postings), keep every other index row as-is
  *      (broadcast anti join again).
  *
  * At 100 TB the cost is |delta postings| + |affected-term postings|,
  * both delta-proportional (affected terms are the delta's vocabulary —
  * stop-word-like terms make the recompute set wider but it is still
  * term-bounded, never corpus-bounded). IndexMaintainSpec proves
  * incremental ≡ from-scratch rebuild, including deleted-then-silent
  * terms and df threshold crossings in both directions.
  */
object IndexMaintain {

  /** Tokenize documents(doc_id, text) to the postings grain. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("tf"))

  /** The ir1-shaped index: term, df, cf, tf-impact-ordered top-3
    * posting head; terms with df < minDf dropped. */
  def buildIndex(postings: DataFrame, minDf: Int = 2): DataFrame = {
    val wW = Window.partitionBy(col("w")).orderBy(col("tf").desc, col("doc_id"))
    postings.withColumn("rn", row_number().over(wW))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        concat_ws(",", transform(
          array_sort(collect_list(when(col("rn") <= 3,
            struct(col("rn"), concat_ws(":", col("doc_id"), col("tf")).as("s"))))),
          x => x.getField("s"))).as("posting_head"))
      .filter(col("df") >= minDf)
      .select(col("w").as("term"), col("df"), col("cf"), col("posting_head"))
  }

  /** Splice a delta batch (new + whole-document-replaced docs) into the
    * postings state. The base side is only ever anti-joined against the
    * (broadcastable) delta doc-id set — no base shuffle. */
  def splicePostings(base: DataFrame, deltaDocs: DataFrame): DataFrame = {
    val deltaIds = deltaDocs.select(col("doc_id")).distinct()
    // re-select: the USING join hoists doc_id to the front; keep the
    // postings grain's canonical (w, doc_id, tf) order
    base.join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
      .select(col("w"), col("doc_id"), col("tf"))
      .unionByName(postings(deltaDocs))
  }

  /** Refresh the index given the OLD postings state and the delta batch.
    * Returns (new postings state, new index). Only affected terms'
    * index rows are recomputed. */
  /** @param materializePostings hook applied to the spliced postings
    *   BEFORE the index recompute reads them. The maintainer passes its
    *   versioned-state write here, so the splice chain (base anti-join +
    *   delta tokenize/aggregate) executes exactly once — the recompute
    *   and every later consumer then scan the written state instead of
    *   re-running the chain (measured: three ~33-task re-executions per
    *   batch in st_index_replay_parity). Default identity keeps the
    *   pure-function shape for one-shot callers. */
  def refresh(basePostings: DataFrame, baseIndex: DataFrame,
      deltaDocs: DataFrame, minDf: Int = 2,
      materializePostings: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    // cached: the id set feeds THREE broadcasts (postings anti-join,
    // affected-term semi-join, splice anti-join) and exchange reuse does
    // not always unify separately-planned broadcast builds of the same
    // distinct — without the cache each one re-runs the delta groupBy
    val deltaIds = deltaDocs.select(col("doc_id")).distinct().cache()
    // tokenize the delta ONCE (cached — delta-bounded by definition):
    // both the postings splice and the affected-term set read it
    val deltaPost = postings(deltaDocs).cache()
    val newPostings = materializePostings(basePostings
      .join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
      .select(col("w"), col("doc_id"), col("tf"))
      .unionByName(deltaPost))
    // affected terms: everything the replaced docs used to mention plus
    // everything the delta mentions now — both delta-bounded
    val affected = basePostings
      .join(broadcast(deltaIds), Seq("doc_id"), "left_semi").select(col("w"))
      .unionByName(deltaPost.select(col("w")))
      .distinct()
    val recomputed = buildIndex(
      newPostings.join(broadcast(affected), Seq("w"), "left_semi"), minDf)
    val untouched = baseIndex.join(
      broadcast(affected.select(col("w").as("term"))), Seq("term"), "left_anti")
    (newPostings, untouched.unionByName(recomputed))
  }
}
