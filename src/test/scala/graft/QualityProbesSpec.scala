package graft

/** Direct-recompute checks for the distribution-health probes. */
class QualityProbesSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("dd53: PSI terms are non-negative and smoothed shares stay a near-distribution") {
    val rows = q("dd53_psi_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucket = r.getInt(0)
      assert(bucket >= 0 && bucket <= 9)
      // (a-b)*ln(a/b) >= 0 for any positive a,b — a negative term means
      // the two smoothed shares were crossed
      assert(r.getDouble(5) >= -1e-12, s"negative PSI term at bucket $bucket")
    }
    // Laplace-smoothed shares over the PRESENT buckets can undershoot 1
    // by at most the mass reserved for absent buckets (10-k)*max_share
    val refSum = rows.map(_.getDouble(3)).sum
    val curSum = rows.map(_.getDouble(4)).sum
    assert(refSum > 0.8 && refSum <= 1.0 + 1e-6, s"ref shares sum $refSum")
    assert(curSum > 0.8 && curSum <= 1.0 + 1e-6, s"cur shares sum $curSum")
  }

  test("dd57: CMS never underestimates and stays inside the eps*N error budget") {
    val rows = q("dd57_cms_calibration").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      // the booleans the oracle asserts TRUE must be genuinely true
      assert(r.getBoolean(2), s"CMS underestimated user ${r.getLong(0)}")
      assert(r.getBoolean(3),
        s"overestimate outside eps*N budget for user ${r.getLong(0)}")
    }
    // determinism: a second build with the same seed gives identical rows
    val again = q("dd57_cms_calibration").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("dd54: max run lengths match a direct per-doc scan") {
    val out = q("dd54_token_runs").collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.core.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
    assert(out.size == docs.length, "one row per document")
    docs.foreach { d =>
      val words = d.getString(1).split(" ", -1)
      var maxRun = 1L; var run = 1L
      var repeatRuns = 0L
      for (i <- 1 until words.length) {
        if (words(i) == words(i - 1)) run += 1
        else { if (run >= 2) repeatRuns += 1; run = 1 }
        if (run > maxRun) maxRun = run
      }
      if (run >= 2) repeatRuns += 1
      val r = out(d.getLong(0))
      assert(r.getLong(1) == maxRun, s"doc ${d.getLong(0)}: max_run")
      assert(r.getLong(2) == repeatRuns, s"doc ${d.getLong(0)}: n_repeat_runs")
      assert(r.getBoolean(3) == (maxRun >= 3))
    }
  }
}
