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
}
