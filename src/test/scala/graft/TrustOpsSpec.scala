package graft

import graft.queries.TrustOps

/** First-principles invariants for the data-trust operators, beyond the
  * DuckDB differential gate: KNN-Shapley's efficiency axiom (values sum
  * to the utility of the full coalition), t-closeness against
  * hand-computed EMDs, Min-K% ordering on a planted rare token,
  * conformal q-hat / coverage on a constructed residual set, and
  * silhouette on separated vs degenerate clusters.
  */
class TrustOpsSpec extends SparkTestBase {

  private def embDf(rows: Seq[(Long, Int, Array[Float])]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("knn-shapley: efficiency axiom — values sum to the full-coalition utility") {
    // one test point (vec_id 0, the only id % 7 == 0), K=2, 1-D line.
    // K nearest to x=0 are ids 1 (label match) and 2 (mismatch) →
    // v(D) = 1/2; Shapley values over train must sum to exactly that.
    val emb = embDf(Seq(
      (0L, 1, Array(0f)),
      (1L, 1, Array(1f)), (2L, 0, Array(2f)), (3L, 1, Array(3f)),
      (4L, 0, Array(4f)), (5L, 1, Array(5f)), (6L, 0, Array(6f))))
    val got = TrustOps.knnShapley(emb, k = 2, panelMod = 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    assert(math.abs(got.values.sum - 0.5) < 1e-6, got.toString)
    // nearer same-label points are worth at least as much as farther ones
    assert(got(1L) >= got(3L) && got(3L) >= got(5L), got.toString)
    // the nearest matching neighbor carries the largest single value
    assert(got(1L) == got.values.max, got.toString)
  }

  private def privDf(rows: Seq[(Long, String, String, Long)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "lang", "source", "n_chars")
  }

  test("t-closeness: matching-distribution group scores 0, concentrated group scores the hand EMD") {
    // bands at width 100: 50 → band 0, 150 → band 1. Global = 5×b0, 3×b1
    // → Q = (0.625, 0.375); m = 2 so t = |P(b0) − 0.625|.
    val docs = privDf(Seq(
      (1L, "en", "g1", 50L), (2L, "en", "g1", 150L),
      (3L, "en", "g2", 50L), (4L, "en", "g2", 50L),
      (5L, "en", "g2", 150L), (6L, "en", "g2", 150L),
      (7L, "en", "g3", 50L), (8L, "en", "g3", 50L)))
    val got = TrustOps.tCloseness(docs, bandWidth = 100, threshold = 0.2)
      .collect().map(r => r.getString(1) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(math.abs(got("g1")._1 - 0.125) < 1e-9 && got("g1")._2 == 0)
    assert(math.abs(got("g2")._1 - 0.125) < 1e-9 && got("g2")._2 == 0)
    assert(math.abs(got("g3")._1 - 0.375) < 1e-9 && got("g3")._2 == 1)
  }

  private def textDf(rows: Seq[(Long, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  test("min-k% prob: a planted rare token raises the doc's min-k bits") {
    val docs = textDf(Seq(
      1L -> "the the the the the",
      2L -> "the the the the rare"))
    val got = TrustOps.minkBits(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.map(t => t._1 -> t).toMap
    // 5 tokens each → n_take = ceil(5/5) = 1
    assert(byDoc(1L)._2 == 1L && byDoc(2L)._2 == 1L)
    assert(byDoc(2L)._3 > byDoc(1L)._3, got.mkString(","))
  }

  test("min-k% prob: n_take is ceil(20%) of the doc's tokens") {
    val docs = textDf(Seq(3L -> "a b c d e f")) // 6 tokens → ceil(6/5) = 2
    val got = TrustOps.minkBits(docs).collect()
    assert(got.length == 1 && got(0).getLong(1) == 2L)
  }

  private def confDf(rows: Seq[(Long, String, Long, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "lang", "n_chars", "text")
  }

  test("conformal: q-hat is the exact order statistic and coverage counts the held-out hits") {
    // calibration (even ids): 4 docs, 10 tokens, 20 chars → ratio 2.0,
    // all residuals 0 → q-hat = 0 (rank least(ceil(0.9·5), 4) = 4).
    // eval (odd ids): two exact (residual 0, covered), one at 25
    // (residual 5, not) → coverage 2/3.
    val ten = Seq.fill(10)("w").mkString(" ")
    val docs = confDf(Seq(
      (0L, "en", 20L, ten), (2L, "en", 20L, ten),
      (4L, "en", 20L, ten), (6L, "en", 20L, ten),
      (1L, "en", 20L, ten), (3L, "en", 20L, ten), (5L, "en", 25L, ten)))
    val got = TrustOps.conformalCoverage(docs).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.0)
    assert(math.abs(r.getDouble(4) - 2.0 / 3) < 1e-6)
  }

  test("silhouette: separated clusters score near 1, degenerate overlap scores 0") {
    val sep = TrustOps.silhouette(embDf(Seq(
      (1L, 0, Array(0f)), (2L, 0, Array(1f)),
      (3L, 1, Array(10f)), (4L, 1, Array(11f))))).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sep(0)._1 == 2L && sep(1)._1 == 2L)
    assert(sep(0)._2 > 0.9 && sep(1)._2 > 0.9, sep.toString)
    // two labels at the same coordinate: a = b = 0 → guard yields 0
    val degen = TrustOps.silhouette(embDf(Seq(
      (1L, 0, Array(2f)), (2L, 1, Array(2f))))).collect()
    assert(degen.forall(_.getDouble(2) == 0.0), degen.mkString(","))
  }
}
