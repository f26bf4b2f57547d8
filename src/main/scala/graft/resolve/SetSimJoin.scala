package graft.resolve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT Jaccard set-similarity self-join via All-Pairs prefix filtering
  * (Bayardo, Ma, Srikant — "Scaling Up All Pairs Similarity Search",
  * WWW'07). The scale path when minhash's recall<1 is not acceptable:
  * candidate volume is bounded by the RARE-token postings instead of
  * every co-occurring pair.
  *
  * Threshold is a rational `tNum/tDen` (e.g. 19/20 = 0.95) so every
  * comparison — the prefix length, the length filter, and the final
  * verify — runs in INTEGER cross-multiplied form; a float threshold at
  * the boundary can disagree between engines and, worse, a float
  * `ceil(t*n)` that rounds a hair high silently shortens the prefix and
  * breaks losslessness.
  *
  * Losslessness (index-prefix x probe-full): if J(A,B) >= t then
  * |A∩B| >= ceil(t*|A|) =: α, and A's suffix of α-1 tokens cannot hold
  * all α common tokens — so at least one lies in A's (|A|-α+1)-token
  * prefix, and the candidate join on (prefix(A), full(B)) finds the
  * pair for either orientation of the a<b ordering.
  */
object SetSimJoin {

  /** @param docs (id: long-castable, toks: array<string>) — per-doc
    *             DISTINCT token sets
    * @return (doc_a, doc_b, jaccard) for all pairs with
    *         J >= tNum/tDen, doc_a < doc_b, jaccard rounded to 6 */
  def exact(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val d = docs.select(col("id").cast("long").as("doc_id"),
      col("toks")).cache()
    // n rides along from size(toks) — toks is already the distinct set,
    // so no per-doc count window; and the PROBE side is the raw postings
    // list (it needs no rarity rank), so the df-join + rank window run
    // once, on the prefix side only, instead of twice
    val tokd = d.select(col("doc_id"), size(col("toks")).cast("long").as("n"),
      explode(col("toks")).as("w"))
    val dfreq = tokd.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // canonical rarity order; ceil(tNum*n/tDen) = (tNum*n + tDen-1) div tDen
    val ranked = tokd.join(dfreq, Seq("w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
    val prefix = ranked
      .filter(col("rn") <= col("n") -
        expr(s"(n * $tNum + ${tDen - 1}) div $tDen") + 1)
      .select(col("doc_id"), col("w"), col("n"))
    // length filter t*|A| <= |B| <= |A|/t, cross-multiplied
    val probe = tokd.select(col("doc_id").as("doc_b"), col("w").as("wb"),
      col("n").as("nb"))
    val cand = prefix
      .join(probe, col("w") === col("wb")
        && col("doc_id") < col("doc_b")
        && col("n") * tNum <= col("nb") * tDen
        && col("nb") * tNum <= col("n") * tDen)
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .distinct()
    val ta = d.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
    val tb = d.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
    cand.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        (size(col("ta")) + size(col("tb"))).cast("long").as("szsum"))
      .filter(col("inter") * tDen >= (col("szsum") - col("inter")) * tNum)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("szsum") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** EXACT directional containment join: ordered pairs (a, b), a ≠ b,
    * with C(A→B) = |A∩B| / |A| >= tNum/tDen — the quote / boilerplate /
    * doc-inclusion detector Jaccard misses (a short doc quoted inside a
    * long one has high containment but low Jaccard, and dd60's length
    * filter would prune the pair outright).
    *
    * Same All-Pairs prefix machinery as [[exact]], adapted: the prefix
    * bound depends only on the CONTAINED side (|A∩B| >= ceil(t*|A|) =: α
    * means A's (|A|-α+1)-token rarity prefix must hit B's full set), and
    * there is NO length filter — B may be arbitrarily large. Candidate
    * volume is bounded by A-prefix postings × full postings on the rare
    * tokens only.
    */
  def containment(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val d = docs.select(col("id").cast("long").as("doc_id"),
      col("toks")).cache()
    // same two savings as [[exact]]: n from size(toks) instead of a
    // count window, and the probe side is the raw postings list so the
    // df-join + rank window run on the prefix side only
    val tokd = d.select(col("doc_id"), size(col("toks")).cast("long").as("n"),
      explode(col("toks")).as("w"))
    val dfreq = tokd.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val ranked = tokd.join(dfreq, Seq("w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
    val prefix = ranked
      .filter(col("rn") <= col("n") -
        expr(s"(n * $tNum + ${tDen - 1}) div $tDen") + 1)
      .select(col("doc_id"), col("w"))
    val probe = tokd.select(col("doc_id").as("doc_b"), col("w").as("wb"))
    val cand = prefix
      .join(probe, col("w") === col("wb") && col("doc_id") =!= col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .distinct()
    val ta = d.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
    val tb = d.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
    cand.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        size(col("ta")).cast("long").as("na"))
      .filter(col("inter") * tDen >= col("na") * tNum)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
  }

  /** Filter-free containment specification (every shared-token ordered
    * pair) — the oracle twin of [[containment]]. */
  def containmentNaive(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val d = docs.select(col("id").cast("long").as("doc_id"), col("toks"))
    val tokd = d.select(col("doc_id"), explode(col("toks")).as("w"))
    val n = d.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    tokd.join(tokd.select(col("doc_id").as("doc_b"), col("w").as("wb")),
        col("w") === col("wb") && col("doc_id") =!= col("doc_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .filter(col("c") * tDen >= col("na") * tNum)
      .select(col("doc_a"), col("doc_b"),
        round(col("c") / col("na").cast("double"), 6).as("containment"))
  }

  /** The filter-free specification: every shared-token pair, exact
    * Jaccard, same threshold algebra. Quadratic in co-occurrence —
    * the oracle `exact` must equal, never the production path. */
  def naive(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val d = docs.select(col("id").cast("long").as("doc_id"), col("toks"))
    val tokd = d.select(col("doc_id"), explode(col("toks")).as("w"))
    val n = d.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    tokd.join(tokd.select(col("doc_id").as("doc_b"), col("w").as("wb")),
        col("w") === col("wb") && col("doc_id") < col("doc_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(col("c") * tDen >= (col("na") + col("nb") - col("c")) * tNum)
      .select(col("doc_a"), col("doc_b"),
        round(col("c") / (col("na") + col("nb") - col("c")).cast("double"), 6)
          .as("jaccard"))
  }
}
