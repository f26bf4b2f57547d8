package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.search.IndexMaintain

case class DocBatchRow(doc_id: Long, text: String)

/** Streaming index maintenance: after any sequence of document
  * micro-batches (new docs + whole-doc updates), the maintained index
  * must equal a from-scratch build over the final corpus.
  */
class IndexStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("micro-batched index state ≡ batch rebuild over the final corpus") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-indexstream").toString

    val seed = Seq(
      DocBatchRow(1L, "spark index spark"),
      DocBatchRow(2L, "index merge"),
      DocBatchRow(3L, "merge spark state")).toDF()
    val m = new IndexMaintainer(spark, work)
    m.init(seed)
    assert(m.index.filter(col("term") === "spark").count() == 1)

    val mem = MemoryStream[DocBatchRow]
    val q = m.start(mem.toDF(), "index_maintain")

    // batch 1: doc 2 replaced (drops 'index' to df=1 → must leave the
    // index), doc 4 is new
    mem.addData(DocBatchRow(2L, "fresh words"), DocBatchRow(4L, "state words"))
    q.processAllAvailable()
    // batch 2: doc 1 replaced too — 'index' disappears entirely
    mem.addData(DocBatchRow(1L, "spark only now"))
    q.processAllAvailable()
    q.stop()

    val finalCorpus = Seq(
      DocBatchRow(1L, "spark only now"),
      DocBatchRow(2L, "fresh words"),
      DocBatchRow(3L, "merge spark state"),
      DocBatchRow(4L, "state words")).toDF()
    val expected = IndexMaintain.buildIndex(IndexMaintain.postings(finalCorpus))
    assert(sameRows(m.index, expected),
      s"streamed index:\n${m.index.collect().mkString("\n")}\nexpected:\n${expected.collect().mkString("\n")}")
    assert(m.index.filter(col("term") === "index").count() == 0)
    assert(sameRows(m.postingsState, IndexMaintain.postings(finalCorpus)))
  }
}
