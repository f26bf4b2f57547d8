package graft

import org.apache.spark.sql.functions._

import graft.queries.ValueOps

/** First-principles invariants for the data-valuation operators, beyond
  * the DuckDB differential gate: winnowing's coverage guarantee, the
  * Bradley–Terry fit against an independent plain-Scala reference,
  * prototype pruning's keep-the-hardest contract, and TextTiling's
  * boundary placement on a constructed topic shift.
  */
class ValueOpsSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  test("winnowing: a shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // k=3, w=4 → any common substring of >= 6 tokens must surface.
    // Surroundings are disjoint vocab, so any shared fp comes from the run.
    val common = "alpha beta gamma delta epsilon zeta"
    val docs = docsDf(Seq(
      1L -> s"aa bb cc dd $common ee ff gg hh",
      2L -> s"pp qq rr ss tt $common uu vv ww"))
    val fps = ValueOps.winnowFingerprints(docs, k = 3, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
  }

  test("winnowing: fingerprints are a subset of the doc's shingle hashes, none from stub windows") {
    val docs = docsDf(Seq(3L -> "one two three four five six seven eight"))
    val fps = ValueOps.winnowFingerprints(docs, k = 3, w = 4)
      .collect().map(_.getLong(1)).toSet
    val hashes = docs
      .select(explode(graft.functions.NativeExpressions.ngrams_native(
        split(col("text"), " "), 3)).as("sh"))
      .select(conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(fps.nonEmpty && fps.subsetOf(hashes))
    // 8 tokens → 6 shingles → 3 full windows; fingerprint count is bounded
    // by the window count
    assert(fps.size <= 3)
  }

  test("winnowing: disjoint docs share no fingerprints") {
    val docs = docsDf(Seq(
      4L -> "red orange yellow green blue indigo violet",
      5L -> "mon tue wed thu fri sat sun"))
    val byDoc = ValueOps.winnowFingerprints(docs, k = 3, w = 4)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((byDoc(4L) intersect byDoc(5L)).isEmpty)
  }

  test("bradley-terry: engine fit matches an independent plain-Scala MM reference") {
    val spark2 = spark
    import spark2.implicits._
    // directed aggregate: A beats B 3/4, B beats C 3/4, A beats C 2/4
    val rows = Seq(
      ("A", "B", 4L, 3L), ("B", "A", 4L, 1L),
      ("B", "C", 4L, 3L), ("C", "B", 4L, 1L),
      ("A", "C", 4L, 2L), ("C", "A", 4L, 2L))
    val agg = rows.toDF("i", "j", "n", "w").localCheckpoint()
    val got = ValueOps.btFit(agg, 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    // independent reference: same MM recurrence in plain Scala, same
    // round-to-12 freezing (BigDecimal HALF_UP, matching Spark's round)
    def r12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val players = Seq("A", "B", "C")
    val wins = players.map(p => p -> rows.filter(_._1 == p).map(_._4).sum).toMap
    var rating = players.map(_ -> 1.0).toMap
    for (_ <- 1 to 5) {
      val unnorm = players.map { p =>
        val den = rows.filter(_._1 == p)
          .map(t => r12(t._3.toDouble / (rating(p) + rating(t._2))))
          .sum
        p -> wins(p) / den.toDouble
      }.toMap
      val s = players.map(p => r12(unnorm(p))).sum.toDouble
      rating = players.map(p => p -> r12(unnorm(p) / s).toDouble).toMap
    }
    players.foreach { p =>
      assert(math.abs(got(p) - rating(p)) < 1e-12, s"$p: ${got(p)} vs ${rating(p)}")
    }
    // A dominates, C trails; ratings normalize to 1
    assert(got("A") > got("B") && got("B") > got("C"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("prototype prune keeps exactly ceil(30%) per label, the hardest first") {
    val spark2 = spark
    import spark2.implicits._
    // label 0: 7 points on a line → centroid at the decimal-frozen mean;
    // label 1: 4 points
    val emb = (
      (0 until 7).map(i => (i.toLong, 0, Array(i.toFloat, 0f))) ++
      (0 until 4).map(i => (100L + i, 1, Array(0f, i.toFloat)))
    ).toDF("vec_id", "label", "embedding")
    val kept = ValueOps.prototypePrune(emb, 3, 10).collect()
    val byLabel = kept.groupBy(_.getInt(1))
    // ceil(0.3*7)=3, ceil(0.3*4)=2
    assert(byLabel(0).length == 3 && byLabel(1).length == 2)
    // hardest first: label-0 centroid x=3 → extremes 0 and 6 (dist 9) tie,
    // then 1 or 5 (dist 4); kept ids must be {0, 6} plus one of {1, 5}
    val ids0 = byLabel(0).map(_.getLong(0)).toSet
    assert(ids0.contains(0L) && ids0.contains(6L))
    // kept min distance >= dropped max distance within each label
    val all = ValueOps.prototypePrune(emb, 10, 10).collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getDouble(2)))
    for ((lbl, rows) <- all.groupBy(_._1)) {
      val keptIds = byLabel(lbl).map(_.getLong(0)).toSet
      val keptMin = rows.filter(r => keptIds.contains(r._2)).map(_._3).min
      val dropMax = rows.filterNot(r => keptIds.contains(r._2)).map(_._3).max
      assert(keptMin >= dropMax)
    }
  }

  test("texttiling places the boundary at a constructed topic shift") {
    // 30 tokens of vocab A then 30 of vocab B (block size 10): gaps 0,1
    // inside A, gap 2 at the shift (zero overlap), gaps 3,4 inside B
    val a = Seq("cat", "dog", "fox", "owl", "bat", "elk", "hen", "ram", "sow", "ewe")
    val b = Seq("zinc", "iron", "gold", "lead", "tin", "neon", "argon", "xenon", "boron", "radon")
    val text = (Seq.fill(3)(a).flatten ++ Seq.fill(3)(b).flatten).mkString(" ")
    val gaps = ValueOps.textTileGaps(docsDf(Seq(9L -> text)), 10)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(gaps.size == 5)
    assert(gaps(2L)._1 == 0.0 && gaps(2L)._2 == 1, gaps.toString)
    assert(Seq(0L, 1L, 3L, 4L).forall(g => gaps(g)._2 == 0), gaps.toString)
  }

  test("texttiling emits a row for zero-overlap gaps (generated spine)") {
    val text = ("p q r s t u v w x y" + " " + "f1 f2 f3 f4 f5 f6 f7 f8 f9 f0")
    val gaps = ValueOps.textTileGaps(docsDf(Seq(10L -> text)), 10).collect()
    assert(gaps.length == 1 && gaps(0).getDouble(2) == 0.0)
  }
}
