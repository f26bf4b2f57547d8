package graft.merge

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Pending-FK queue with deterministic two-pass drain (SURVEY.md §1.1 /
  * §7.4 item 2). The reference parks child rows whose parent hasn't
  * arrived yet (`properties_pending_fk`, `etl_properties.py:177-241`;
  * generic queue `etl_fk_retry_queue.py`) and retries them once after the
  * full run. Dataflow shape:
  *
  *   pass 1: staged children → valid (semi-join parents) ∪ pending (anti)
  *   upstream load lands more parents
  *   pass 2: pending re-checked once → drained ∪ still-pending(attempts+1)
  */
object PendingFk {

  final case class SplitResult(valid: DataFrame, pending: DataFrame)

  /** One validation pass: children whose FK resolves go to `valid`;
    * the rest to `pending` with an attempt counter. */
  def split(children: DataFrame, parents: DataFrame, fk: String, parentKey: String,
      attempt: Int): SplitResult = {
    val keys = parents.select(col(parentKey)).distinct()
    val valid = children.join(keys, children(fk) === keys(parentKey), "left_semi")
    val pending = children.join(keys, children(fk) === keys(parentKey), "left_anti")
      .withColumn("fk_attempts", lit(attempt))
    SplitResult(valid, pending)
  }

  /** The reference's full cycle: main pass, then exactly one drain pass
    * against the post-load parent set. Returns (all-valid, still-pending). */
  def twoPass(staged: DataFrame, parentsBefore: DataFrame, parentsAfter: DataFrame,
      fk: String, parentKey: String): SplitResult = {
    val first = split(staged, parentsBefore, fk, parentKey, attempt = 1)
    val drain = split(first.pending.drop("fk_attempts"), parentsAfter, fk, parentKey,
      attempt = 2)
    SplitResult(first.valid.unionByName(drain.valid), drain.pending)
  }
}
