package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Invariant pins for the corpus-scrub family (dd18/dd19/dd20): the
  * planted-signal ground truth must be recovered exactly — PII only on
  * every 7th doc, boilerplate flagged on every 3rd, URL provenance
  * matching the planting schedule. The DuckDB oracle proves Spark≡SQL;
  * these prove both match the *intended* semantics.
  */
class DocSignalsSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf0001)

  private lazy val docs = Tables(spark, sf0001, "documents")

  test("dd18: PII detected exactly on the planted docs, redaction removes it all") {
    val out = q("dd18_pii_redact").cache()
    val planted = docs.filter(col("doc_id") % 7 === 0).count()
    assert(out.filter(col("has_pii")).count() == planted)
    // planted docs carry exactly one email + one phone; the rest none
    assert(out.filter(col("has_pii") &&
      (col("n_emails") =!= 1 || col("n_phones") =!= 1)).count() == 0)
    assert(out.filter(!col("has_pii") &&
      (col("n_emails") =!= 0 || col("n_phones") =!= 0)).count() == 0)
    // a clean doc's redaction is the identity: md5(redacted) == md5(text)
    val clean = docs.select(col("doc_id"), md5(col("text")).as("m"))
    val joined = out.join(clean, "doc_id")
      .filter(!col("has_pii") && col("redacted_md5") =!= col("m"))
    assert(joined.count() == 0)
    out.unpersist()
  }

  test("dd19: boilerplate paragraph flagged on every 3rd doc, fractions bounded") {
    val out = q("dd19_paragraph_dedup").cache()
    assert(out.count() == docs.count())
    // every planted doc sees >=1 paragraph with df>=3 (the boilerplate)
    assert(out.filter(col("doc_id") % 3 === 0 && col("n_boiler") < 1).count() == 0)
    assert(out.filter(col("retained_frac") < 0 || col("retained_frac") > 1).count() == 0)
    assert(out.filter(col("n_shared") > col("n_paras")).count() == 0)
    out.unpersist()
  }

  test("dd47: OOV fractions bounded, languages partition the corpus, vocab actually covers") {
    val out = q("dd47_vocab_oov").cache()
    // languages partition the corpus: per-lang doc counts sum to the total
    assert(out.agg(sum(col("docs"))).collect()(0).getLong(0) == docs.count())
    assert(out.filter(col("avg_oov") < 0 || col("avg_oov") > 1).count() == 0)
    assert(out.filter(col("oov_tokens") > col("total_tokens")).count() == 0)
    // a top-10 vocab over a ~31-token vocabulary must cover SOMETHING
    // in every language (avg_oov strictly below 1) yet not everything
    // (strictly above 0) — both degenerate ends would hide bugs
    assert(out.filter(col("avg_oov") <= 0 || col("avg_oov") >= 1).count() == 0)
    out.unpersist()
  }

  test("dd48: Zipf slope is strictly negative for every source, ranks capped") {
    val out = q("dd48_zipf_slope").cache()
    // frequency is non-increasing in rank, so the log-log OLS slope of
    // any real frequency profile is negative
    assert(out.count() > 1)
    assert(out.filter(col("zipf_slope") >= 0).count() == 0)
    assert(out.filter(col("n_terms") > 100 || col("n_terms") < 2).count() == 0)
    out.unpersist()
  }

  test("dd20: per-domain counts match the planting schedule") {
    val out = q("dd20_url_stats").cache()
    val cdnDocs = docs.filter(col("doc_id") % 8 === 0).count()
    val cdn = out.filter(col("domain") === "cdn.example.org").collect()
    assert(cdn.length == 1 && cdn(0).getAs[Long]("n_docs") == cdnDocs)
    // site domains partition the doc%4 planting by doc%10
    val siteUrlTotal = out.filter(col("domain").startsWith("site"))
      .agg(sum(col("n_urls"))).collect()(0).getLong(0)
    assert(siteUrlTotal == docs.filter(col("doc_id") % 4 === 0).count())
    out.unpersist()
  }
}
