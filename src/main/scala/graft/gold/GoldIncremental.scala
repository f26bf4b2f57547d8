package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.merge.MergeKernels

/** Incremental gold-table maintenance (SURVEY.md §4 "incremental
  * processing" + §3.2): instead of rebuilding an entire MV three times a
  * day like the reference, recompute ONLY the parents whose children
  * changed and splice them in with the child-replace kernel.
  *
  * At 100 TB this turns the refresh from O(full fact table) into
  * O(touched parent groups): the changed-key set prunes both the gold
  * rewrite (replaceWhere on parent id) and the recompute scan (semi-join
  * pushes the key filter to the fact scan).
  */
object GoldIncremental {

  /** @param goldPrev    current gold table (one row per parentKey)
    * @param changedKeys frame holding the parent keys touched this run
    * @param recompute   the gold pipeline, applied only to a key subset
    */
  def refresh(
      goldPrev: DataFrame,
      changedKeys: DataFrame,
      parentKey: String)(
      recompute: DataFrame => DataFrame): DataFrame = {
    val keys = changedKeys.select(col(changedKeys.columns.head).as(parentKey)).distinct()
    val recomputed = recompute(keys)
    MergeKernels.childReplace(goldPrev, recomputed, parentKey)
  }
}
