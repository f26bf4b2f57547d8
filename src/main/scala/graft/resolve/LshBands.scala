package graft.resolve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The house MinHash-LSH banding discipline, shared by the batch
  * admission query (dd116) and the streaming admission maintainer
  * (streaming/LshAdmitStream): 8 md5-derived minhashes over the per-doc
  * DISTINCT word-3-gram shingle array (the native one-pass MinHashSig,
  * value-identical to the DuckDB oracle's
  * `min(('0x'||substring(md5('i#'||sh),1,15))::BIGINT)` formulation),
  * banded 4×2 with md5 band keys. One definition site — a banding change
  * here changes the query, the maintainer, and every oracle in lockstep
  * or not at all.
  */
object LshBands {

  /** (doc_id, band_idx, bkey) for docsArr = (doc_id, shArr). */
  def bandsOf(docsArr: DataFrame): DataFrame = {
    val mh = docsArr.select(col("doc_id"),
      graft.functions.NativeExpressions.minhash_sig_native(col("shArr")).as("sig"))
      .select(col("doc_id") +: (0 until 8).map(i =>
        element_at(col("sig"), i + 1).as(s"mh$i")): _*)
    mh.select(col("doc_id"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band_idx"),
        md5(concat(col(s"mh${2 * b}").cast("string"),
          col(s"mh${2 * b + 1}").cast("string"))).as("bkey"))): _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.bkey").as("bkey"))
  }

  /** Exact shingle-Jaccard verification of band-collision candidates:
    * cand = (d_id, s_id), probe/standing shingles as (doc_id, sh),
    * sizes as (doc_id, n) → (d_id, s_id, jacc) at or above `threshold`.
    * Only candidate docs' shingles are joined — the standing relation is
    * semi-join-pruned by the candidate list, never scanned pairwise. */
  def verify(cand: DataFrame, probeSh: DataFrame, standingSh: DataFrame,
             probeN: DataFrame, standingN: DataFrame,
             threshold: Double): DataFrame = {
    val common = cand
      .join(probeSh.select(col("doc_id").as("d_id"), col("sh")), Seq("d_id"))
      .join(standingSh.select(col("doc_id").as("s_id"), col("sh")), Seq("s_id", "sh"))
      .groupBy(col("d_id"), col("s_id")).agg(count(lit(1)).as("common"))
    common
      .join(probeN.select(col("doc_id").as("d_id"), col("n").as("nd")), Seq("d_id"))
      .join(standingN.select(col("doc_id").as("s_id"), col("n").as("ns")), Seq("s_id"))
      .select(col("d_id"), col("s_id"),
        (col("common").cast("double") / (col("nd") + col("ns") - col("common")))
          .as("jacc"))
      .filter(col("jacc") >= threshold)
  }
}
