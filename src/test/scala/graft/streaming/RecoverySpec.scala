package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.search.IndexMaintain

/** Crash recovery for the parquet-versioned maintainers: a NEW instance
  * pointed at the same workDir must resume from the latest fully
  * committed version — including when a crash left a torn version
  * (first table written, second not).
  */
class RecoverySpec extends SparkTestBase {
  import spark.implicits._

  test("index maintainer: restart resumes the exact state; torn versions are skipped") {
    val work = java.nio.file.Files.createTempDirectory("graft-recover-ix").toString
    val a = new IndexMaintainer(spark, work)
    a.init(Seq((1L, "spark index spark"), (2L, "index merge"))
      .toDF("doc_id", "text"))
    a.applyBatch(Seq((3L, "merge spark state")).toDF("doc_id", "text"))
    a.applyBatch(Seq((2L, "fresh words")).toDF("doc_id", "text"))

    // fresh instance, same directory: resumes at v2 with identical state
    val b = new IndexMaintainer(spark, work)
    assert(b.recover() == 2)
    assert(sameRows(b.index, a.index))
    assert(sameRows(b.postingsState, a.postingsState))

    // torn version: postings_v3 committed, index_v3 missing → still v2
    val torn = new java.io.File(work, "postings_v3")
    torn.mkdirs()
    new java.io.File(torn, "_SUCCESS").createNewFile()
    assert(new IndexMaintainer(spark, work).recover() == 2)
    // an uncommitted (markerless) index_v3 doesn't change that
    new java.io.File(work, "index_v3").mkdirs()
    assert(new IndexMaintainer(spark, work).recover() == 2)

    // the recovered instance keeps maintaining: next batch lands as v3
    // (overwriting the torn leftovers) and equals a from-scratch rebuild
    b.applyBatch(Seq((4L, "state words")).toDF("doc_id", "text"))
    val finalCorpus = Seq((1L, "spark index spark"), (2L, "fresh words"),
      (3L, "merge spark state"), (4L, "state words")).toDF("doc_id", "text")
    assert(sameRows(b.index,
      IndexMaintain.buildIndex(IndexMaintain.postings(finalCorpus))))
  }

  test("drift monitor: restart resumes the running histogram") {
    val work = java.nio.file.Files.createTempDirectory("graft-recover-dr").toString
    val ref = Seq.tabulate(100)(i => i.toDouble).toDF("value")
    val a = new DriftMonitor(spark, work, bucketWidth = 50.0, nBuckets = 10)
    a.init(ref, "value")
    a.applyBatch(Seq(10.0, 470.0, 480.0).toDF("value"), "value")
    a.applyBatch(Seq(490.0, 20.0).toDF("value"), "value")

    val b = new DriftMonitor(spark, work, bucketWidth = 50.0, nBuckets = 10)
    assert(b.recover() == 2)
    assert(sameRows(b.currentHistogram, a.currentHistogram))
    assert(math.abs(b.psi() - a.psi()) < 1e-12)
  }

  test("recover on an empty directory refuses loudly instead of inventing v0") {
    val work = java.nio.file.Files.createTempDirectory("graft-recover-empty").toString
    intercept[IllegalStateException] {
      new IndexMaintainer(spark, work).recover()
    }
  }

  test("gold maintainer: restart resumes fact+gold at the committed pair") {
    val work = java.nio.file.Files.createTempDirectory("graft-recover-gold").toString
    def buildGold(fact: org.apache.spark.sql.DataFrame) =
      fact.groupBy(col("k")).agg(sum(col("v")).as("total"))
    val a = new GoldMaintainer(spark, "k", work, buildGold)
    a.init(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    a.applyBatch(Seq((2L, 25L)).toDF("k", "v"))

    val b = new GoldMaintainer(spark, "k", work, buildGold)
    assert(b.recover() == 1)
    assert(sameRows(b.gold, a.gold))
    assert(sameRows(b.fact, a.fact))
  }
}
