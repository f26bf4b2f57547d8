package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming near-dup admission on constructed rows: label semantics
  * (near_dup vs new, strictly-earlier-batch candidates only, jacc/min-id
  * tiebreak), the real writeStream path, and crash recovery from the
  * versioned parquet state. The sf-corpus replay ≡ one-shot SQL is the
  * driver-gated `st_lsh_admission_parity` row.
  */
class LshAdmitStreamSpec extends SparkTestBase {
  import spark.implicits._

  // ≥3 tokens each (3-gram shingles); A' is a near-dup of A, Z is unrelated
  private val A = "the quick brown fox jumps over the lazy dog again"
  private val Aprime = "quick brown fox jumps over the lazy dog again"
  private val Z = "completely different words about spark shuffles and parquet footers"

  test("labels near_dup vs new; intra-batch pairs are NOT matched; recovery resumes") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-lshadmit").toString

    val m = new LshAdmitMaintainer(spark, work)
    m.init(Seq((1L, A)).toDF("doc_id", "text"))
    assert(m.decisions.count() == 0, "init docs carry no decision")

    val mem = MemoryStream[DocBatchRow]
    val q = m.start(mem.toDF(), "lsh_admit")
    // batch 1: a near-dup of doc 1 AND an unrelated doc — the unrelated
    // doc must not match doc 2 (same batch, no strictly-earlier edge)
    mem.addData(DocBatchRow(2L, Aprime), DocBatchRow(3L, Z))
    q.processAllAvailable()
    // batch 2: an exact copy of Z — now Z IS strictly earlier
    mem.addData(DocBatchRow(4L, Z))
    q.processAllAvailable()
    q.stop()

    val d = m.decisions.collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(d(2L)._1 == "near_dup" && d(2L)._2.contains(1L), d.toString)
    assert(d(3L)._1 == "new", d.toString)
    assert(d(4L)._1 == "near_dup" && d(4L)._2.contains(3L), d.toString)

    // recovery: a fresh maintainer over the same workDir resumes at the
    // latest committed version with identical decisions and index size
    val m2 = new LshAdmitMaintainer(spark, work)
    assert(m2.recover() == 2)
    assert(sameRows(m2.decisions, m.decisions))
    assert(m2.bands.select("doc_id").distinct().count() == 4)

    // and keeps admitting: another A-near-dup must match doc 1 (min-id
    // tiebreak over the equally-similar doc 2)
    m2.applyBatch(Seq((5L, Aprime)).toDF("doc_id", "text"))
    val d5 = m2.decisions.filter(col("doc_id") === 5L).collect().head
    // doc 5 IS doc 2's text: jacc(5,2)=1.0 beats jacc(5,1)=0.875 → match 2
    assert(d5.getString(1) == "near_dup")
    assert(d5.getLong(2) == 2L && d5.getDouble(3) == 1.0, d5.toString)
  }

  test("short docs (<3 tokens) admit with no shingles and label new") {
    val work = java.nio.file.Files.createTempDirectory("graft-lshadmit2").toString
    val m = new LshAdmitMaintainer(spark, work)
    m.init(Seq((1L, A)).toDF("doc_id", "text"))
    m.applyBatch(Seq((2L, "too short"), (3L, A)).toDF("doc_id", "text"))
    val d = m.decisions.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "new", 3L -> "near_dup"))
  }
}
