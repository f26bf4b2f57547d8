package graft.resolve

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Prefix-filter losslessness as a PROPERTY, not a fixture: on random
  * corpora over a small alphabet (dense co-occurrence — the worst case
  * for a candidate filter) the filtered join must equal the filter-free
  * naive join at every threshold, including the degenerate 1/1.
  */
class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private val corpusGen: Gen[List[Set[String]]] =
    Gen.chooseNum(2, 14).flatMap { nDocs =>
      Gen.listOfN(nDocs,
        Gen.chooseNum(1, 6).flatMap(k =>
          Gen.pick(k, alphabet).map(_.toSet)))
    }

  test("prefix-filtered join ≡ naive join on random corpora across thresholds") {
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.toSeq.sorted) }
        .toDF("id", "toks")
      Seq((2, 5), (1, 2), (4, 5), (19, 20), (1, 1)).forall {
        case (num, den) =>
          sameRows(SetSimJoin.exact(docs, num, den),
            SetSimJoin.naive(docs, num, den))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("containment prefix-filtered join ≡ naive containment on random corpora") {
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.toSeq.sorted) }
        .toDF("id", "toks")
      Seq((2, 5), (1, 2), (4, 5), (19, 20), (1, 1)).forall {
        case (num, den) =>
          sameRows(SetSimJoin.containment(docs, num, den),
            SetSimJoin.containmentNaive(docs, num, den))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("containment is directional: a subset is contained, its superset is not") {
    val docs = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b", "c", "d", "e", "f")))
      .toDF("id", "toks")
    val out = SetSimJoin.containment(docs, 1, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // C(1→2) = 2/2 = 1.0; C(2→1) = 2/6 — below any threshold = 1
    assert(out == Seq((1L, 2L, 1.0)))
  }

  test("identical sets always pair at threshold 1; disjoint sets never pair") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")),
      (3L, Seq("d", "e")), (4L, Seq("f"))).toDF("id", "toks")
    val out = SetSimJoin.exact(docs, 1, 1).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 1.0)))
  }

  test("singleton-token docs: prefix is the whole (1-token) set, still found") {
    val docs = Seq((1L, Seq("x")), (2L, Seq("x")), (3L, Seq("y")))
      .toDF("id", "toks")
    val out = SetSimJoin.exact(docs, 1, 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }
}
