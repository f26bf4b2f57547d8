package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the release-gate curation batch (CurateOps) —
  * above all the LOSSLESSNESS of dd60's prefix-filtered candidate
  * generation, proven against a filter-free naive join inside Spark
  * (independent of the DuckDB parity, which proves the same thing against
  * a second engine).
  */
class ReleaseGateSpec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf001)

  test("dd60: prefix-filtered join ≡ the naive shared-shingle join (lossless candidates)") {
    // same 3-shingle representation as the query (unigrams are useless on
    // the ~31-word vocabulary — see the dd60 doc), naive filter-free twin
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .filter(size(col("arr")) >= 3)
      .select(col("doc_id"), array_distinct(
        graft.functions.NativeExpressions.ngrams_native(col("arr"), 3)).as("toks"))
    val naive = graft.resolve.SetSimJoin.naive(
      docs.select(col("doc_id").as("id"), col("toks")), tNum = 3, tDen = 4)
    assert(sameRows(naive, run("dd60_setsim_join")))
  }

  test("dd60: every reported pair clears the threshold") {
    val bad = run("dd60_setsim_join").filter(col("jaccard") < 0.75).count()
    assert(bad == 0, s"$bad pairs below 0.75")
  }

  test("dd61: bands partition the equivalence classes and row shares sum to 1") {
    val out = run("dd61_kanonymity").cache()
    val eq = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy(col("event_type"), col("ts").cast("date"),
        floor(col("value") / 50).cast("long"))
      .agg(count(lit(1)).as("k"))
    val Array(classes, rows) = eq.agg(count(lit(1)), sum(col("k"))).collect()(0)
      .toSeq.map(_.toString.toLong).toArray
    val got = out.agg(sum(col("classes")), sum(col("rows_in_band")),
      sum(col("row_share"))).collect()(0)
    assert(got.getLong(0) == classes)
    assert(got.getLong(1) == rows)
    assert(math.abs(got.getDouble(2) - 1.0) < 1e-4)
    out.unpersist()
  }

  test("dd62: shares sum to 1 and exactly one majority class") {
    val out = run("dd62_label_balance").cache()
    val s = out.agg(sum(col("share"))).collect()(0).getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4, s"share sum $s")
    assert(out.filter(col("ratio_to_majority") === 1.0).count() >= 1)
    assert(out.filter(col("entropy_term") < 0).count() == 0)
    out.unpersist()
  }

  test("dd63: any_rule dominates each individual rule and rates stay in [0,1]") {
    val rows = run("dd63_gopher_rules").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val any = rows("any_rule")
    val singles = rows - "any_rule"
    assert(singles.values.forall(_ <= any))
    assert(any <= singles.values.sum, "any_rule exceeds the union bound")
    assert(any >= singles.values.max)
  }

  test("dd64: buckets conserve the corpus and bracket their lengths") {
    val out = run("dd64_length_buckets").collect()
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(out.map(_.getLong(1)).sum == docs)
    out.foreach { r =>
      val (bucket, mn, mx, sm, waste) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(mx <= bucket, s"max $mx over bucket $bucket")
      assert(bucket == 1 || mn > bucket / 2, s"min $mn not in ($bucket/2, $bucket]")
      assert(waste >= 0 && waste < 1)
      assert(sm >= mn && sm <= r.getLong(1) * mx)
    }
  }

  test("w26: each state's outgoing probabilities sum to 1") {
    val out = run("w26_markov_transitions")
      .groupBy(col("cur_type")).agg(sum(col("prob")).as("p"))
      .filter(abs(col("p") - 1.0) > 1e-4)
    assert(out.count() == 0)
  }

  test("a23: IV terms are non-negative (WoE and share-gap always share sign)") {
    val out = run("a23_woe_binning").cache()
    assert(out.filter(col("iv_term") < 0).count() == 0)
    // class totals conserve the order count
    val orders = spark.read.parquet(s"$sf001/orders.parquet").count()
    assert(out.agg(sum(col("n"))).collect()(0).getLong(0) == orders)
    out.unpersist()
  }

  test("dd65: cluster-aware split leaks nothing and conserves the corpus") {
    val out = run("dd65_cluster_split").collect()
    assert(out.map(_.getLong(3)).forall(_ == 0L), "leaked_fps != 0")
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(out.map(_.getLong(1)).sum == docs)
    assert(out.map(_.getString(0)).toSet == Set("train", "val", "test"))
  }

  test("w27: CUSUM is non-negative and alarms only above the threshold") {
    val out = run("w27_cusum_drift").cache()
    assert(out.filter(col("cusum") < 0).count() == 0)
    assert(out.filter(col("alarm") && col("cusum") <= 0).count() == 0)
    // every type's first day has cusum = max(0, first deviation) — finite
    assert(out.count() > 0)
    out.unpersist()
  }

  test("dd66: precisions and BLEU live in (0,1]; trimmed-head pairs never score 1") {
    val out = run("dd66_bleu_pairs").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p1, p2, b) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p1 > 0 && p1 <= 1 && p2 > 0 && p2 <= 1 && b > 0 && b <= 1)
      assert(p1 < 1.0, "the dropped 3-word head must cost unigram precision")
    }
  }

  test("ir9: at most 2 negatives per query, never the query itself") {
    val out = run("ir9_hard_negatives").cache()
    assert(out.groupBy(col("q_id")).count().filter(col("count") > 2).count() == 0)
    assert(out.filter(col("q_id") === col("neg_id")).count() == 0)
    out.unpersist()
  }

  test("ir8: exactly 10 docs, log-prob scores, ranked non-increasing") {
    val out = run("ir8_query_likelihood").collect()
    assert(out.length == 10)
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(_ < 0), "query-likelihood log scores must be negative")
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), "not ranked")
  }
}
