package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // Anti-join on the CHANGED keys, not on the recomputed rows: a changed
    // parent whose recompute yields zero rows (all child facts deleted / no
    // longer qualifies) must drop its stale gold row, or incremental
    // diverges from a full rebuild. The using-column join hoists the key
    // to position 0, so re-project goldPrev's column order — the refreshed
    // frame must be schema-identical to a full rebuild, not just
    // name-equivalent.
    // SHUFFLE_HASH hint (round-10, from the 100× canary's OOM): the gold
    // side carries KB-scale rendered-JSON rows, and the default sort-merge
    // anti-join SORTS all of them just to drop the changed keys — at 100×
    // that sorter competes for task memory with the rest of the stage's
    // operators and can fail to acquire pages. Hash-building the SLIM key
    // side and STREAMING the fat gold side never sorts gold at all —
    // cheaper at every scale, not just a fix.
    goldPrev.join(keys.hint("shuffle_hash"), Seq(parentKey), "left_anti")
      .unionByName(recomputed)
      .select(goldPrev.columns.map(col).toIndexedSeq: _*)
  }
}
