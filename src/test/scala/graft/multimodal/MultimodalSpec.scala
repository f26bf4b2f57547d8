package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

class MultimodalSpec extends SparkTestBase {

  private lazy val docs = Tables(spark, sf0001, "documents")

  test("pack produces opaque blob + typed metadata, byte-exact") {
    val packed = Multimodal.pack(docs).cache()
    assert(packed.schema("blob").dataType.typeName == "binary")
    val r = packed.select(col("doc_id"), col("meta.n_bytes"),
      length(col("blob"))).collect()
    assert(r.nonEmpty && r.forall(row => row.getInt(1) == row.getInt(2)))
    packed.unpersist()
  }

  test("feature extraction is deterministic, fixed-dim, and batch-safe") {
    val packed = Multimodal.pack(docs)
    val f1 = Multimodal.extractFeatures(packed).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(packed.repartition(7))
      .orderBy("doc_id").collect()
    assert(f1.length == docs.count())
    assert(f1.forall(_.getSeq[Float](1).length == Multimodal.featureDim))
    // repartitioning must not change any feature value (decoder is per-row)
    assert(f1.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq ==
      f2.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)
  }

  test("metadata-only reads do not require decoding the blob") {
    val meta = Multimodal.pack(docs).select("doc_id", "meta.mime", "meta.lang")
    assert(meta.distinct().count() >= 5) // one row per (doc, mime, lang) combo
    assert(!meta.columns.contains("blob"))
  }
}
