package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the data-selection batch (SelectOps) — the
  * invariants the DuckDB oracle's value-equality cannot state on its own.
  */
class SelectOpsSpec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf001)

  test("dd67: selection is target-seeking — mean LLR of the selected 20 beats the pool mean") {
    // DSIR's whole point: the kept slice must score higher under the
    // target LM than a random slice would. The top-20 per-token LLR mean
    // must strictly exceed 0 (the pool-average LLR is ~0 by construction:
    // raw includes the target).
    val sel = run("dd67_dsir_select").agg(avg(col("llr_per_token"))).head.getDouble(0)
    assert(sel > 0, s"selected mean LLR $sel not positive")
  }

  test("dd68: approx terciles stay balanced and ordered within every language") {
    val out = run("dd68_ppl_buckets").cache()
    // exactly the head/middle/tail spine per language
    val perLang = out.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
    assert(perLang.nonEmpty && perLang.forall(_.getAs[Long]("n") == 3L),
      "every language must emit exactly the 3-bucket spine")
    // the tolerance gates the oracle asserts TRUE must be genuinely true:
    // bucket shares in [0.2, 0.47] and head mean <= tail mean
    assert(out.filter(!col("share_ok")).count() == 0,
      "approx tercile cutpoints must keep bucket shares within tolerance")
    assert(out.filter(!col("order_ok")).count() == 0,
      "head bucket must have lower mean bits than tail")
  }

  test("dd69: entropy is 0 exactly on the unique band and l-bands partition the classes") {
    val out = run("dd69_ldiversity").cache()
    val uniq = out.filter(col("l_band") === "unique").head
    assert(uniq.getAs[Double]("avg_entropy") == 0.0 &&
      uniq.getAs[Double]("min_entropy") == 0.0,
      "a single-sensitive-value class has zero entropy by definition")
    // log2(l) upper-bounds entropy: the low band (l < 5) stays under log2(4)
    val low = out.filter(col("l_band") === "low")
    if (low.count() > 0)
      assert(low.head.getAs[Double]("avg_entropy") <= 2.0)
  }

  test("ir10: fused ranks come only from the two top-50 lists and rrf is bounded") {
    val out = run("ir10_rrf_fusion").cache()
    assert(out.filter(col("n_lists") > 2 || col("n_lists") < 1).count() == 0)
    // max possible rrf = 1/61 + 1/61 (rank 1 in both lists)
    assert(out.filter(col("rrf") > 2.0 / 61 + 1e-9).count() == 0)
    // a doc in both lists must outrank docs in one list at equal ranks:
    // the top fused doc is in both lists on this corpus
    assert(out.orderBy(col("rrf").desc).head.getAs[Long]("n_lists") == 2)
  }

  test("dd70: BPE merge application never increases token count and is bounded below by words") {
    val out = run("dd70_bpe_encode").cache()
    // chars >= bpe tokens (merges only shrink) and compression >= 1
    assert(out.filter(col("n_bpe_tokens") > col("n_chars")).count() == 0)
    assert(out.filter(col("compression") < 1.0).count() == 0)
  }

  test("dd72: release is reproducible and non-negative") {
    val a = run("dd72_dp_release").collect().map(_.toSeq)
    val b = run("dd72_dp_release").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "seeded noise must make the release deterministic")
    assert(a.forall(r => r(3).asInstanceOf[Long] >= 0L), "released counts clamp at 0")
  }

  test("ir11: ndcg is in (0, 1] and idcg dominates dcg") {
    val r = run("ir11_ndcg_eval").head
    val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
      r.getAs[Double]("ndcg"))
    assert(idcg >= dcg, "ideal ordering maximizes DCG by definition")
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9, s"ndcg $ndcg out of range")
  }

  test("e8: metrics are probabilities and candidate pairs bound hit pairs") {
    val r = run("e8_blocking_eval").head
    assert(r.getAs[Double]("reduction_ratio") >= 0 &&
      r.getAs[Double]("reduction_ratio") <= 1)
    assert(r.getAs[Double]("pair_completeness") >= 0 &&
      r.getAs[Double]("pair_completeness") <= 1)
    assert(r.getAs[Long]("hit_pairs") <= r.getAs[Long]("cand_pairs"),
      "a hit pair is by definition a candidate pair")
    assert(r.getAs[Long]("hit_pairs") <= r.getAs[Long]("true_pairs"))
  }

  test("dd71: validation recovers the planted ground truth exactly") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val planted = docs.filter(col("doc_id") % 5 === 0).count()
    val valid = docs.filter(col("doc_id") % 10 === 0).count()
    val r = run("dd71_luhn_pii").head
    assert(r.getAs[Long]("n_candidates") == planted,
      "regex must find every planted number and nothing else (corpus has no digits)")
    assert(r.getAs[Long]("n_luhn_valid") == valid,
      "constructed check digits: even ids valid, odd ids broken by +5")
    assert(r.getAs[Long]("n_luhn_rejected") == planted - valid)
  }

  test("dd73: allocation exhausts the budget exactly and never exceeds a cap") {
    val out = run("dd73_unimax_alloc").cache()
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val total = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val budget = 39L * total / 40L
    val allocSum = out.agg(sum(col("alloc"))).head.getDouble(0)
    assert(math.abs(allocSum - budget) < 1e-3,
      s"water-filling must exhaust the budget: $allocSum vs $budget")
    assert(out.filter(col("alloc") > col("tokens") + 1e-9).count() == 0,
      "no source may exceed its 1-epoch cap")
    assert(out.filter(col("capped") && col("alloc") =!= col("tokens").cast("double"))
      .count() == 0, "a capped source is allocated exactly its cap")
    // uncapped sources all sit at the same water level alloc/w
    val lam = out.filter(!col("capped"))
      .select((col("alloc") / sqrt(col("tokens").cast("double"))).as("lam"))
      .agg(max(col("lam")) - min(col("lam"))).head.getDouble(0)
    assert(lam < 1e-4, s"uncapped sources must share one water level, spread $lam")
  }

  test("dd74: KN is a sub-probability over SEEN continuations (mass reserved for unseen)") {
    // rebuild P_KN per (prev, next) and check sum over seen nexts <= 1 per
    // context — the discount D reserves exactly the unseen mass, so a sum
    // above 1 means the formula (not just a value) is wrong
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .filter(size(col("arr")) >= 2)
    val bigrams = docs.select(explode(expr(
      "transform(sequence(0, size(arr)-2), i -> struct(arr[i] AS prev, arr[i+1] AS next))")).as("b"))
      .select(col("b.prev").as("prev"), col("b.next").as("next"))
    val pc = bigrams.groupBy(col("prev"), col("next")).agg(count(lit(1)).as("c"))
    val pv = pc.groupBy(col("prev")).agg(sum(col("c")).as("cp"), count(lit(1)).as("n1v"))
    val cw = pc.groupBy(col("next")).agg(count(lit(1)).as("n1w"))
    val n1all = pc.count().toDouble
    val p = pc.join(pv, Seq("prev")).join(cw, Seq("next"))
      .select(col("prev"),
        (greatest(col("c") - lit(0.75), lit(0)) / col("cp") +
          lit(0.75) * col("n1v") / col("cp") * (col("n1w") / lit(n1all))).as("p"))
    val over = p.groupBy(col("prev")).agg(sum(col("p")).as("s"))
      .filter(col("s") > 1.0 + 1e-9).count()
    assert(over == 0, s"$over contexts with seen-mass > 1")
  }

  test("dd77: the distributed Newton steps match a driver-side reference fit") {
    // recompute the exact 2-step Newton fit on collected rows in plain
    // Scala doubles; the engine's decimal-frozen distributed sums must
    // land on the same coefficients to 4 dp
    val feats = spark.read.parquet(s"$sf001/documents.parquet")
      .select(
        log(size(split(col("text"), " ")).cast("double")).as("x1"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def solve(s: Array[Double], g: Array[Double]): Array[Double] = {
      val Array(s00, s01, s02, s11, s12, s22) = s
      val det = s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02) +
        s02 * (s01 * s12 - s11 * s02)
      Array(
        ((s11 * s22 - s12 * s12) * g(0) + (s02 * s12 - s01 * s22) * g(1) +
          (s01 * s12 - s02 * s11) * g(2)) / det,
        ((s02 * s12 - s01 * s22) * g(0) + (s00 * s22 - s02 * s02) * g(1) +
          (s01 * s02 - s00 * s12) * g(2)) / det,
        ((s01 * s12 - s02 * s11) * g(0) + (s01 * s02 - s00 * s12) * g(1) +
          (s00 * s11 - s01 * s01) * g(2)) / det)
    }
    def sums(w: ((Double, Double, Double)) => Double,
             res: ((Double, Double, Double)) => Double) = {
      val s = Array(0.0, 0, 0, 0, 0, 0); val g = Array(0.0, 0, 0)
      feats.foreach { f =>
        val (x1, x2, _) = f; val wi = w(f); val ri = res(f)
        s(0) += wi; s(1) += wi * x1; s(2) += wi * x2
        s(3) += wi * x1 * x1; s(4) += wi * x1 * x2; s(5) += wi * x2 * x2
        g(0) += ri; g(1) += x1 * ri; g(2) += x2 * ri
      }
      (s, g)
    }
    val (sA, gA) = sums(_ => 0.25, f => f._3 - 0.5)
    val b1 = solve(sA, gA)
    def p(f: (Double, Double, Double), b: Array[Double]) =
      1.0 / (1.0 + math.exp(-(b(0) + b(1) * f._1 + b(2) * f._2)))
    val (sB, gB) = sums(f => { val pi = p(f, b1); pi * (1 - pi) },
      f => f._3 - p(f, b1))
    val d = solve(sB, gB)
    val b2 = Array(b1(0) + d(0), b1(1) + d(1), b1(2) + d(2))
    val r = run("dd77_logreg_train").head
    for ((name, i) <- Seq("b0" -> 0, "b1" -> 1, "b2" -> 2))
      assert(math.abs(r.getAs[Double](name) - b2(i)) < 5e-4,
        s"$name: engine ${r.getAs[Double](name)} vs reference ${b2(i)}")
    assert(r.getAs[Double]("accuracy") >= 0 && r.getAs[Double]("accuracy") <= 1)
  }

  test("dd90: binned AUC matches a driver-side exact Mann-Whitney to bin resolution") {
    // score every doc under dd77's published coefficients, compute the
    // EXACT tie-corrected AUC on collected rows, and require the engine's
    // 1000-bin statistic to agree within binning resolution
    val b = run("dd77_logreg_train").head
    val (b0, b1, b2) =
      (b.getAs[Double]("b0"), b.getAs[Double]("b1"), b.getAs[Double]("b2"))
    val py = spark.read.parquet(s"$sf001/documents.parquet")
      .select(
        log(size(split(col("text"), " ")).cast("double")).as("x1"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      .collect().map { r =>
        (1.0 / (1.0 + math.exp(-(b0 + b1 * r.getDouble(0) + b2 * r.getDouble(1)))),
          r.getDouble(2))
      }
    val pos = py.filter(_._2 == 1.0).map(_._1)
    val neg = py.filter(_._2 == 0.0).map(_._1)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val exact = num / (pos.length.toDouble * neg.length)
    val out = run("dd90_roc_auc").head
    assert(out.getAs[Long]("n_pos") == pos.length &&
      out.getAs[Long]("n_neg") == neg.length)
    val auc = out.getAs[Double]("auc")
    assert(math.abs(auc - exact) < 5e-3,
      s"binned AUC $auc vs exact $exact — outside bin resolution")
    assert(math.abs(out.getAs[Double]("gini") - (2 * auc - 1)) < 2e-6)
  }

  test("w28: residuals recompute from the published baseline and day values") {
    val out = run("w28_seasonal_residuals")
    val bad = out.filter(
      abs(col("residual") - round(col("daily_value") - col("dow_mean"), 6)) > 1e-9).count()
    assert(bad == 0, "residual must equal daily_value - dow_mean")
  }
}
