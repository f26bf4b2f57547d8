package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Entity resolution (SURVEY.md §2.8 E1–E3): tiered md5 fingerprint
  * dedup with fall-through, blocked fuzzy matching, and weighted
  * canonical-identity scoring. All joins are blocked equi-joins — an
  * all-pairs cross join never appears in any plan (mandatory at 100 TB:
  * the reference's own name-index blocking,
  * `create_person_deduplication_table.py:619-653`).
  */
object Resolve {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- E1: hierarchical fingerprint dedup with tier fall-through ------
    QueryDef(
      "e1_fingerprint_dedup",
      "3-tier md5 fingerprint cascade over supplier: finest tier grouping ≥2 records wins; tier-weighted confidence; unmatched → NULL (create_person_deduplication_table.py:516-617)",
      Some("""
        WITH fp AS (
          SELECT s_suppkey,
                 md5(concat_ws('|', s_nationkey,
                               CAST(floor(s_acctbal / 100) AS BIGINT))) AS fp1,
                 md5(concat_ws('|', s_nationkey,
                               CAST(floor(s_acctbal / 2000) AS BIGINT))) AS fp2,
                 md5(concat_ws('|', s_nationkey)) AS fp3
          FROM supplier
        ), cnt AS (
          SELECT *,
                 COUNT(*) OVER (PARTITION BY fp1) AS n1,
                 COUNT(*) OVER (PARTITION BY fp2) AS n2,
                 COUNT(*) OVER (PARTITION BY fp3) AS n3
          FROM fp
        )
        SELECT s_suppkey,
               CASE WHEN n1 > 1 THEN 1 WHEN n2 > 1 THEN 2 WHEN n3 > 1 THEN 3 END AS match_tier,
               CASE WHEN n1 > 1 THEN fp1 WHEN n2 > 1 THEN fp2 WHEN n3 > 1 THEN fp3 END AS group_id,
               CASE WHEN n1 > 1 THEN CAST(n1 AS BIGINT) WHEN n2 > 1 THEN CAST(n2 AS BIGINT)
                    WHEN n3 > 1 THEN CAST(n3 AS BIGINT) END AS group_size,
               CASE WHEN n1 > 1 THEN 0.95 WHEN n2 > 1 THEN 0.80 WHEN n3 > 1 THEN 0.65 END AS confidence
        FROM cnt
      """)) { (s, dir) =>
      val fp = t(s, dir, "supplier").select(
        col("s_suppkey"),
        md5(concat_ws("|", col("s_nationkey"),
          floor(col("s_acctbal") / 100))).as("fp1"),
        md5(concat_ws("|", col("s_nationkey"),
          floor(col("s_acctbal") / 2000))).as("fp2"),
        md5(concat_ws("|", col("s_nationkey"))).as("fp3"))
      val cnt = fp
        .withColumn("n1", count(lit(1)).over(Window.partitionBy("fp1")))
        .withColumn("n2", count(lit(1)).over(Window.partitionBy("fp2")))
        .withColumn("n3", count(lit(1)).over(Window.partitionBy("fp3")))
      cnt.select(
        col("s_suppkey"),
        when(col("n1") > 1, 1).when(col("n2") > 1, 2).when(col("n3") > 1, 3)
          .as("match_tier"),
        when(col("n1") > 1, col("fp1")).when(col("n2") > 1, col("fp2"))
          .when(col("n3") > 1, col("fp3")).as("group_id"),
        when(col("n1") > 1, col("n1")).when(col("n2") > 1, col("n2"))
          .when(col("n3") > 1, col("n3")).as("group_size"),
        when(col("n1") > 1, 0.95).when(col("n2") > 1, 0.80)
          .when(col("n3") > 1, 0.65).as("confidence"))
    },

    // ---- E2: blocked fuzzy fallback match -------------------------------
    QueryDef(
      "e2_blocked_fuzzy",
      "Blocked levenshtein similarity join: block on first name token, top-1 candidate, never all-pairs (create_person_deduplication_table.py:619-653)",
      Some("""
        WITH parts AS (
          SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS block
          FROM part
        ), pairs AS (
          SELECT q.p_partkey AS query_key, q.p_name AS query_name,
                 c.p_partkey AS cand_key, c.p_name AS cand_name,
                 levenshtein(q.p_name, c.p_name) AS dist
          FROM parts q JOIN parts c
            ON q.block = c.block AND q.p_partkey <> c.p_partkey
          WHERE q.p_partkey % 50 = 0 AND levenshtein(q.p_name, c.p_name) <= 4
        )
        SELECT query_key, query_name, cand_key, cand_name, dist FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_key
                                       ORDER BY dist, cand_key) AS rn
          FROM pairs
        ) WHERE rn = 1
      """)) { (s, dir) =>
      val parts = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("block"))
      val q = parts.filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey").as("query_key"), col("p_name").as("query_name"),
          col("block"))
      val c = parts
        .select(col("p_partkey").as("cand_key"), col("p_name").as("cand_name"),
          col("block"))
      val pairs = q.join(c, Seq("block"))            // blocked equi-join
        .filter(col("query_key") =!= col("cand_key"))
        .withColumn("dist", levenshtein(col("query_name"), col("cand_name")))
        .filter(col("dist") <= 4)
      val w = Window.partitionBy("query_key").orderBy(col("dist"), col("cand_key"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_key"), col("query_name"), col("cand_key"),
          col("cand_name"), col("dist"))
    },

    // ---- E3: weighted canonical-identity scoring ------------------------
    QueryDef(
      "e3_weighted_identity",
      "Composite weighted score (name sim + balance closeness + segment) over blocked candidates, best ≥ threshold (brief_facts_ai/main.py:260-376)",
      Some("""
        WITH qs AS (
          SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
          FROM customer WHERE c_custkey % 100 = 0
        ), pairs AS (
          SELECT q.c_custkey AS query_key,
                 c.c_custkey AS cand_key,
                 (0.5 * (1.0 - CAST(levenshtein(q.c_name, c.c_name) AS DOUBLE)
                              / greatest(length(q.c_name), length(c.c_name), 1))
                  + 0.3 * (1.0 - abs(q.c_acctbal - c.c_acctbal)
                               / greatest(abs(q.c_acctbal), abs(c.c_acctbal), 1.0))
                  + 0.2) AS score
          FROM qs q JOIN customer c
            ON q.c_nationkey = c.c_nationkey AND q.c_mktsegment = c.c_mktsegment
          WHERE q.c_custkey <> c.c_custkey
        )
        SELECT query_key, cand_key, score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_key
                                       ORDER BY score DESC, cand_key) AS rn
          FROM pairs WHERE score >= 0.5
        ) WHERE rn = 1
      """)) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val qs = cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").as("query_key"), col("c_name").as("q_name"),
          col("c_nationkey").as("q_nation"), col("c_mktsegment").as("q_seg"),
          col("c_acctbal").as("q_bal"))
      val pairs = qs.join(cust,
          col("q_nation") === col("c_nationkey") && col("q_seg") === col("c_mktsegment"))
        .filter(col("query_key") =!= col("c_custkey"))
        .select(col("query_key"), col("c_custkey").as("cand_key"),
          (lit(0.5) * (lit(1.0) - levenshtein(col("q_name"), col("c_name")).cast("double")
              / greatest(length(col("q_name")), length(col("c_name")), lit(1)))
            + lit(0.3) * (lit(1.0) - abs(col("q_bal") - col("c_acctbal"))
              / greatest(abs(col("q_bal")), abs(col("c_acctbal")), lit(1.0)))
            + lit(0.2)).as("score"))
      val w = Window.partitionBy("query_key").orderBy(col("score").desc, col("cand_key"))
      pairs.filter(col("score") >= 0.5)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_key"), col("cand_key"), col("score"))
    })
}
