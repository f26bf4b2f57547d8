package graft

/** Invariants of the dd17 curation funnel that the DuckDB oracle cannot
  * see (it only proves Spark ≡ DuckDB, not that the funnel is shaped
  * like a funnel): stage counts shrink monotonically, every stage
  * actually fires on the fixture, and the three splits partition the
  * decontaminated survivors exactly. Guards future threshold edits from
  * silently turning a stage into a no-op.
  */
class FunnelSpec extends SparkTestBase {

  test("dd17 stages shrink monotonically, all fire, and splits partition the tail") {
    val rows = SparkEntry.all.find(_.name == "dd17_corpus_funnel").get
      .run(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("ord"), r.getAs[String]("stage"),
        r.getAs[Long]("docs"), r.getAs[Long]("id_checksum")))
    val pipeline = rows.filter(_._1 <= 6).sortBy(_._1)
    assert(pipeline.map(_._2).toSeq ==
      Seq("all", "quality", "dedup", "repetition", "bench_holdout", "decontam"))
    // monotone non-increasing, and each filtering stage drops at least one doc
    pipeline.map(_._3).sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    val drops = pipeline.map(_._3).sliding(2).map { case Array(a, b) => a - b }.toSeq
    assert(drops.forall(_ > 0), s"some stage dropped nothing: $drops")
    // splits partition the decontaminated tail: counts AND checksums add up
    val tail = pipeline.last
    val splits = rows.filter(_._1 == 7)
    assert(splits.length == 3)
    assert(splits.map(_._3).sum == tail._3)
    assert(splits.map(_._4).sum == tail._4)
  }
}
