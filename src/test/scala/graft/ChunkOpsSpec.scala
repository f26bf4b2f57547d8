package graft

import graft.queries.ChunkOps

/** The CDC contract, first-principles: boundaries are content-defined,
  * so an edit perturbs only its own chunk; chunks partition the doc and
  * reassemble it exactly. */
class ChunkOpsSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  private val words =
    (1 to 80).map(i => s"tok$i").mkString(" ")

  test("chunks partition the doc: token counts sum and concatenation rebuilds the text") {
    val out = ChunkOps.cdcChunks(docsDf(Seq(1L -> words)), 16)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._3).sum == 80L)
    assert(out.map(_._2).mkString(" ") == words)
  }

  test("an insertion perturbs at most two chunk classes (content-defined boundaries)") {
    val edited = {
      val parts = words.split(" ").toVector
      (parts.take(40) :+ "INSERTED").++(parts.drop(40)).mkString(" ")
    }
    val chunks = ChunkOps.cdcChunks(docsDf(Seq(1L -> words, 2L -> edited)), 16)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(2)).toSet).toMap
    val a = chunks(1L); val b = chunks(2L)
    // the edit changes the containing chunk only; if the inserted token
    // happens to be a boundary it splits that chunk into two — so the
    // original loses at most 1 chunk class and the edited doc gains at
    // most 2
    assert((a diff b).size <= 1, (a diff b).toString)
    assert((b diff a).size <= 2, (b diff a).toString)
    assert((a intersect b).nonEmpty)
  }

  test("identical docs share every chunk class; the dd112 shape reports them") {
    val shared = ChunkOps.cdcChunks(docsDf(Seq(1L -> words, 2L -> words)), 16)
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val agg = shared
      .select(col("doc_id"), md5(col("chunk_text")).as("chash"))
      .groupBy("chash").agg(countDistinct(col("doc_id")).as("n_docs"))
      .collect()
    assert(agg.nonEmpty && agg.forall(_.getLong(1) == 2L))
  }
}
