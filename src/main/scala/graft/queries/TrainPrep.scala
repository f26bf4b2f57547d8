package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Global training-stream packing — the complement of dd26's per-shard
  * packing (ScaleOps.scala:210). dd26 packs each language independently
  * (window per shard key), which is the right shape when a shard key
  * exists; dd40 is the case when the training order is a single GLOBAL
  * stream (curriculum order, epoch shuffle output) and the cumulative
  * token sum looks like it needs one global-order window. It doesn't:
  * the cumsum is two-phase — per-bucket totals lifted to global prefix
  * offsets by a tiny bucket-level join — the same distributed
  * zipWithIndex shape as dd35's ordinals.
  */
object TrainPrep {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "dd40_seq_packing",
      "Training-sequence packing over the GLOBAL doc_id stream (vs dd26's per-language): concat-and-chunk at 256 tokens, per-doc sequence id / offset / straddle flag. The global cumulative sum is TWO-PHASE: per-bucket token totals (bucket = doc_id div 64) become bucket offsets via a tiny bucket-level inequality join — never a single-partition window — then a within-bucket window lifts local prefix sums to global ones; widening the bucket scales the pattern to any corpus size",
      Some("""
        WITH toks AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        cum AS (
          SELECT doc_id, n_tokens,
            COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM toks
        )
        SELECT doc_id, n_tokens,
          CAST(before // 256 AS BIGINT) AS seq_id,
          CAST(before % 256 AS BIGINT) AS seq_offset,
          CAST((before + n_tokens - 1) // 256 AS BIGINT) AS end_seq_id,
          ((before + n_tokens - 1) // 256) > (before // 256) AS straddles
        FROM cum
      """)) { (s, dir) =>
      val cap = 256L
      val toks = t(s, dir, "documents").select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        floor(col("doc_id") / 64).as("bucket"))
      val counts = toks.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("c"))
      // bucket offsets via an inequality join over the TINY bucket-count
      // relation (O(B^2) pairs, B = corpus/64 buckets — broadcastable at
      // any realistic scale), not a global-order window
      val offsets = counts.as("x")
        .join(counts.as("y"), col("y.bucket") < col("x.bucket"), "left")
        .groupBy(col("x.bucket").as("bucket"))
        .agg(coalesce(sum(col("y.c")), lit(0L)).as("off"))
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val before = col("off") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L))
      toks.join(broadcast(offsets), Seq("bucket"))
        .withColumn("before", before)
        .select(col("doc_id"), col("n_tokens"),
          floor(col("before") / cap).as("seq_id"),
          (col("before") % cap).as("seq_offset"),
          floor((col("before") + col("n_tokens") - 1) / cap).as("end_seq_id"),
          (floor((col("before") + col("n_tokens") - 1) / cap) >
            floor(col("before") / cap)).as("straddles"))
    },

    // ---- dd44: fixed-size deterministic sample per group -----------------
    QueryDef(
      "dd44_group_sample",
      "Fixed-k deterministic sample: exactly min(k,|group|)=5 docs per language, ranked by md5 of the id (uniform-ish, reproducible across runs and engines) — the complement of dd10's rate-based sampling when the contract is a firm per-group quota; one language-keyed window, rows beyond k never leave the partial sort",
      Some("""
        WITH ranked AS (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents
        )
        SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= 5
      """)) { (s, dir) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents").select(col("lang"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
    })
}
