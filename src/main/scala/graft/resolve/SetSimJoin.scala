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
    *         J >= tNum/tDen, doc_a < doc_b, jaccard rounded to 6
    *
    * Round-11 note: porting [[containment]]'s hashed-key/window-free/
    * positional-filter rework here was tried and MEASURED WORSE — base
    * sf0.1 2.2× slower (1.34→2.99 s; the inverted-index collect_list +
    * per-doc sort_array costs more than the window it replaced at this
    * threshold's candidate volume) and 100× inside noise (22.5→26.5 s vs
    * a ±20% environment band shown by the untouched dd88 drifting
    * 21.0→22.4 s the same day). Reverted to this shape; do not redo
    * without a measured win at BOTH scales. */
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
    * Round-10 rework (10× deep-run ratio was 2.57, the inventory's worst
    * genuinely-scaling heavy query; now 1.63). Four compounding moves,
    * each lossless:
    *
    *  1. ℓ-PREFIX COUNT FILTER (ℓ=2). The classic 1-prefix emits a
    *     candidate for EVERY shared prefix token, and at a high threshold
    *     (α = ceil(t·|A|) ≈ 39 on this corpus) nearly all candidates are
    *     junk pairs sharing a single token (measured 2.35M candidates for
    *     5,120 true rows at 10×). Pigeonhole on the (|A|−α+ℓ)-token prefix:
    *     a true pair has ≥ min(ℓ, α) common tokens there — so group the
    *     prefix matches by pair and demand cnt ≥ min(ℓ, α) (min, not ℓ:
    *     α < ℓ happens for 1–2-shingle docs). Candidates drop ~50×; the
    *     verify stage's input is output-proportional, not junk-dominated.
    *  2. POSITIONAL FILTER (PPJoin, Xiao et al. 2008): the k-th smallest
    *     common token (global rarity order) has α−k common tokens above it
    *     in BOTH docs, so a surviving match needs
    *     (ℓ + min(|A|−rn, |B|−rnb))·tDen ≥ |A|·tNum — integer
    *     cross-multiplied like every other threshold here.
    *  3. ONE-SIDED SIZE FILTER: |A∩B| ≤ |B| forces |B|·tDen ≥ |A|·tNum
    *     (B may still be arbitrarily LARGER — containment has no upper
    *     length bound, unlike Jaccard's).
    *  4. HASHED TOKEN KEYS + WINDOW-FREE RANKING. Every exchange and the
    *     candidate join carry xxhash64(shingle) longs, never shingle
    *     strings; and the rarity ranking is built without a global window
    *     sort — ONE groupBy(h) yields the inverted index with df, a
    *     re-explode annotates postings with df (no second join), and a
    *     groupBy(doc) with a per-doc sort_array replaces the window's
    *     full-partition sort. An intra-doc hash collision would break the
    *     prefix lemma's set semantics, so it raise_errors loudly
    *     (P ≈ |doc|²/2^65 per doc) rather than silently dropping pairs;
    *     the final verify recomputes |A∩B| on TRUE token arrays (the
    *     candidate set is tiny and broadcasts, so the doc relation never
    *     shuffles), keeping the output exact even in the cross-doc
    *     collision case the guard does not cover.
    */
  def containment(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val ell = 2
    val d = docs.select(col("id").cast("long").as("doc_id"), col("toks"))
    val dh = d.select(col("doc_id"),
      transform(col("toks"), w => xxhash64(w)).as("hs0"),
      size(col("toks")).cast("long").as("n"))
      .select(col("doc_id"), col("n"),
        when(size(array_distinct(col("hs0"))) =!= col("n"),
          raise_error(concat(lit("intra-doc shingle hash collision in doc "),
            col("doc_id").cast("string"))))
          .otherwise(col("hs0")).as("hs"))
    val tokd = dh.select(col("doc_id"), col("n"), explode(col("hs")).as("h"))
    // inverted index WITH df in one exchange; the re-explode annotates
    // every posting with its token's df without a second join
    val inv = tokd.groupBy(col("h")).agg(count(lit(1)).as("df"),
      collect_list(struct(col("doc_id"), col("n"))).as("ds"))
    val tj = inv.select(col("h"), col("df"), explode(col("ds")).as("x"))
      .select(col("x.doc_id").as("doc_id"), col("x.n").as("n"),
        col("df"), col("h"))
    // per-doc rarity-sorted token array: (df asc, h asc) struct sort —
    // |doc|-element array sorts instead of a global window sort
    val darr = tj.groupBy(col("doc_id"))
      .agg(first(col("n")).as("n"),
        transform(sort_array(collect_list(struct(col("df"), col("h")))),
          x => x.getField("h")).as("sws"))
    val alphaA = expr(s"(n * $tNum + ${tDen - 1}) div $tDen")
    val prefix = darr
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("sws"), lit(1),
          (col("n") - alphaA + ell).cast("int"))))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("rn"),
        col("col").as("h"))
    val probe = darr
      .select(col("doc_id").as("doc_b"), col("n").as("nb"),
        posexplode(col("sws")))
      .select(col("doc_b"), col("nb"), (col("pos") + 1).as("rnb"),
        col("col").as("hb"))
    val cand = prefix
      .join(probe, col("h") === col("hb") && col("doc_id") =!= col("doc_b")
        && col("nb") * tDen >= col("n") * tNum
        && (lit(ell.toLong) + least(col("n") - col("rn"),
              col("nb") - col("rnb"))) * tDen >= col("n") * tNum)
      .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("cnt"), first(col("n")).as("n"))
      .filter(col("cnt") >= least(lit(ell.toLong),
        expr(s"(n * $tNum + ${tDen - 1}) div $tDen")))
      .select(col("doc_a"), col("doc_b"))
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
