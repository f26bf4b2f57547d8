package graft.resolve

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Structural properties of the round-8 linkage completions: e14's
  * mutual-best 1:1 guarantee and e16's per-block review quota. Both are
  * oracle-gated on values; these tests pin the INVARIANTS the oracle
  * comparison alone would not state explicitly.
  */
class LinkageSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("e14: the mutual-best match is a 1:1 assignment on both sides") {
    val rows = q("e14_mutual_best_match").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // no name appears twice on either side — the property row_number
    // top-1 per query (the reference's shape) does NOT give
    assert(rows.map(_._1).distinct.length == rows.length, "left side not 1:1")
    assert(rows.map(_._2).distinct.length == rows.length, "right side not 1:1")
    rows.foreach { case (_, _, jw) => assert(jw >= 0.7 && jw <= 1.0) }
  }

  test("e16: at most 3 review pairs per block, rank contiguous from 1") {
    val rows = q("e16_review_queue").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (block, g) =>
      val rks = g.map(_._3).sorted.toSeq
      assert(rks.length <= 3, s"block $block over quota")
      assert(rks == (1 to rks.length), s"block $block ranks not contiguous")
    }
    // every queued pair sits strictly inside the uncertain band
    rows.foreach { case (_, jw, _) => assert(jw >= 0.75 && jw < 0.92) }
  }

  test("e17: pattern counts are consistent with the corpus size") {
    val r = q("e17_fs_em").collect().head
    val (t, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n11 + n10 + n01 + n00 == t, "pattern counts must partition all pairs")
    // all EM outputs are probabilities
    Seq(5, 6, 7, 8, 9).foreach { i =>
      val p = r.getDouble(i)
      assert(p > 0 && p < 1, s"column $i out of (0,1): $p")
    }
  }
}
