package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 curation operators — properties
  * the DuckDB hash parity can't state (planted-recall bounds, scale-form
  * ≡ spec-form equivalences, conservation laws).
  */
class CurationOpsSpec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf001)

  test("dd31: every planted tail-trimmed variant is caught with high duplicated coverage") {
    val out = run("dd31_substring_dedup").cache()
    val planted = out.filter(col("doc_id") >= 10000)
    assert(planted.count() > 0)
    // a variant shares all but its first 8-gram-window with the original:
    // coverage must be near-total, and never below half
    val low = planted.filter(col("dup_fraction") < 0.5).count()
    assert(low == 0, s"$low planted variants with dup_fraction < 0.5")
    out.unpersist()
  }

  test("dd34: the high-degree hub side dominates the PageRank top-20") {
    val top = run("dd34_pagerank").collect()
    // the part↔supplier graph's supplier side has ~20× the degree: the
    // entire top-20 must be suppliers
    assert(top.forall(_.getString(0).startsWith("s")),
      top.map(_.getString(0)).mkString(","))
  }

  test("dd35: two-phase bucketed ordinal ≡ the single-window specification") {
    val tiered = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        when(col("n_chars") >= 600, 0).when(col("n_chars") >= 300, 1)
          .otherwise(2).as("tier"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket",
        instr(lit("0123456789abcdef"), substring(col("h"), 1, 1)) - 1)
    val spec = tiered.withColumn("ordinal",
      row_number().over(Window.partitionBy("tier")
        .orderBy(col("bucket"), col("h"), col("doc_id"))))
      .select(col("doc_id"), col("ordinal"))
    val scale = run("dd35_curriculum_order").select(col("doc_id"), col("ordinal"))
    assert(sameRows(spec, scale))
  }

  test("dd35: curriculum positions are globally unique and tiers interleave") {
    val out = run("dd35_curriculum_order").cache()
    val n = out.count()
    assert(out.select(col("curriculum_pos")).distinct().count() == n)
    // round-robin law: pos mod 3 recovers the tier
    assert(out.filter(pmod(col("curriculum_pos"), lit(3)) =!= col("tier")).count() == 0)
    out.unpersist()
  }

  test("dd36: unmarked docs pass through byte-identical; marked docs lose exactly the markup") {
    val out = run("dd36_markup_strip").cache()
    assert(out.filter(!col("had_markup") && col("visible_ratio") =!= 1.0).count() == 0)
    val marked = out.filter(col("had_markup"))
    assert(marked.count() > 0)
    assert(marked.filter(col("visible_ratio") >= 1.0).count() == 0)
    out.unpersist()
  }

  test("dd30: perplexity is defined for every multi-token doc and bounded by the smoothed-model ceiling") {
    val out = run("dd30_lm_perplexity").cache()
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() == docs, "one score per multi-token doc")
    // Laplace smoothing bounds every bigram's probability strictly
    // inside (0, 1): average bits must be positive and finite
    assert(out.filter(col("avg_bits") <= 0 || col("avg_bits").isNull).count() == 0)
    out.unpersist()
  }

  test("w13: day-0 retention is exactly 1.0 for every cohort") {
    val out = run("w13_cohort_retention")
    val d0 = out.filter(col("day_offset") === 0)
    assert(d0.count() > 0)
    assert(d0.filter(col("retention") =!= 1.0).count() == 0)
    assert(d0.filter(col("n_active") =!= col("cohort_size")).count() == 0)
  }

  test("dd55: calibration buckets are band-consistent and the estimator tracks truth directionally") {
    val rows = run("dd55_minhash_calibration").collect()
      .sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val slots = r.getInt(0)
      // an LSH candidate collided on a band = 2 consecutive equal slots
      assert(slots >= 2 && slots <= 8, s"slots $slots outside band-implied range")
      assert(r.getLong(2) > 0)
      val (mean, mn, mx) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9, s"mean outside [min,max] at $slots")
      assert(math.abs(r.getDouble(1) - slots / 8.0) < 1e-9)
    }
    // direction: full signature agreement must average at least as high a
    // true Jaccard as the weakest agreement bucket
    assert(rows.last.getDouble(3) >= rows.head.getDouble(3),
      "calibration not directionally consistent")
  }

  test("dd101: planted C4 violations land exactly on their doc_id residues") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("source")).cache()
    val expect = docs.groupBy(col("source")).agg(
      count(lit(1)).as("e_docs"),
      sum(when(col("doc_id") % 23 === 0, 1L).otherwise(0L)).as("e_lorem"),
      sum(when(col("doc_id") % 17 === 0, 1L).otherwise(0L)).as("e_brace"),
      sum(when(col("doc_id") % 3 =!= 0, 1L).otherwise(0L)).as("e_punct"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = run("dd101_c4_filters").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (eDocs, eLorem, eBrace, ePunct) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == eDocs)
      assert(r.getAs[Long]("drop_lorem") == eLorem, s"lorem ${r}")
      assert(r.getAs[Long]("drop_brace") == eBrace, s"brace ${r}")
      // terminal '.' is planted on %3 == 0 ONLY, so the punct rule drops
      // exactly the complement
      assert(r.getAs[Long]("drop_punct") == ePunct, s"punct ${r}")
      assert(r.getAs[Long]("n_pass") <= eDocs - eLorem.max(eBrace))
    }
    docs.unpersist()
  }

  test("dd102: fertility and chars_per_word are exact ratios of the integer sums") {
    val rows = run("dd102_tokenizer_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r.getAs[Long]("n_words"); val sub = r.getAs[Long]("n_subwords")
      assert(words > 0 && sub >= words) // >= 1 subword per word by construction
      assert(math.abs(r.getAs[Double]("fertility") -
        BigDecimal(sub.toDouble / words).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("dd103: the survival curve is monotone and catches every planted near-dup at 0.5") {
    val curve = run("dd103_dedup_curve").collect()
      .map(r => (r.getAs[Double]("threshold"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))).sortBy(_._1)
    assert(curve.map(_._1).sameElements(Array(0.5, 0.6, 0.7, 0.8, 0.9)))
    // monotone non-increasing in the threshold, docs bounded by 2x pairs
    curve.sliding(2).foreach { case Array((_, p1, _), (_, p2, _)) =>
      assert(p2 <= p1) }
    curve.foreach { case (_, p, d) => assert(d <= 2 * p) }
    // every planted (doc, doc+10000) pair whose variant still has >= 8
    // words shares all its 8-grams with the original: jaccard
    // (n-10)/(n-7) -- above 1/2 whenever the variant has >= 6 shingles
    val planted = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") % 5 === 0 &&
        size(split(col("text"), " ")) >= 16)
      .count()
    assert(curve.head._2 >= planted,
      s"pairs at 0.5 = ${curve.head._2} < planted $planted")
  }
}
