package graft

import java.util.concurrent.atomic.AtomicBoolean

import scala.util.control.NonFatal

/** Master-orchestration semantics (SURVEY.md §3.1; reference
  * `etl_master/master_etl.py:113,212,279-379`): the reference's master
  * runs a fixed ORDERED list of blocks, retries a failing block before
  * giving up, takes a run-lock so two masters can never execute
  * concurrently, and dedupes view-refresh steps that the block list
  * names more than once.
  *
  * Deterministic and test-injectable: the sleeper is a parameter (like
  * `RawZone.fetchWithRetry`), so specs simulate retries without wall
  * clock.
  */
object Orchestrator {

  /** One ordered unit of work. `refreshKey`: blocks sharing a key are a
    * refresh STEP — only the first occurrence in a run executes (the
    * reference's duplicate refresh-step dedupe, master_etl.py:279-379). */
  final case class Block(
      name: String,
      step: () => Unit,
      refreshKey: Option[String] = None)

  /** Outcome of one block: status ∈ ok | failed | skipped_duplicate |
    * not_run (a prior block exhausted its retries). */
  final case class BlockRun(
      name: String,
      attempts: Int,
      status: String,
      error: Option[String] = None)

  /** @param acquired false = another master holds the run lock; nothing
    *                 executed. */
  final case class RunReport(
      acquired: Boolean,
      blocks: Seq[BlockRun],
      succeeded: Boolean)

  /** Run-lock singleton: the reference takes a lock row in the control
    * DB so cron overlap can't double-run the master; in-JVM the same
    * contract is an atomic flag. */
  private val runLock = new AtomicBoolean(false)

  /** Execute `blocks` in order. Each block gets `1 + maxRetries`
    * attempts (reference default: retry ×2) with a linear backoff
    * through `sleeper`; a block that exhausts its attempts aborts the
    * rest of the run (ordered blocks are dependency-ordered), and the
    * remaining blocks report `not_run`.
    */
  def run(
      blocks: Seq[Block],
      maxRetries: Int = 2,
      backoffMs: Long = 1000L,
      sleeper: Long => Unit = Thread.sleep): RunReport = {
    if (!runLock.compareAndSet(false, true))
      return RunReport(acquired = false, Nil, succeeded = false)
    try {
      val seenRefresh = scala.collection.mutable.Set.empty[String]
      val out = Seq.newBuilder[BlockRun]
      var aborted = false
      blocks.foreach { b =>
        if (aborted)
          out += BlockRun(b.name, 0, "not_run")
        else if (b.refreshKey.exists(k => !seenRefresh.add(k)))
          out += BlockRun(b.name, 0, "skipped_duplicate")
        else {
          var attempt = 0
          var ok = false
          var lastError: Option[String] = None
          while (!ok && attempt <= maxRetries) {
            attempt += 1
            try { b.step(); ok = true }
            catch {
              case NonFatal(e) =>
                lastError = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
                if (attempt <= maxRetries) sleeper(backoffMs * attempt)
            }
          }
          if (!ok) aborted = true
          out += BlockRun(b.name, attempt,
            if (ok) "ok" else "failed", if (ok) None else lastError)
        }
      }
      val runs = out.result()
      RunReport(acquired = true, runs,
        succeeded = runs.forall(r => r.status == "ok" || r.status == "skipped_duplicate"))
    } finally runLock.set(false)
  }

  /** Test hook: simulate a concurrently-held lock. Returns false if the
    * lock was already held. */
  private[graft] def tryHoldLock(): Boolean = runLock.compareAndSet(false, true)
  private[graft] def releaseLock(): Unit = runLock.set(false)
}
