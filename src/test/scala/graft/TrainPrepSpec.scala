package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic invariants for the global-packing, hierarchy, and SCD2
  * operators — conservation laws and scale-form ≡ spec-form equivalences
  * the DuckDB hash parity can't state.
  */
class TrainPrepSpec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf001)

  test("dd40: packing conserves tokens, offsets are contiguous, and two-phase ≡ one global window") {
    val out = run("dd40_seq_packing").cache()
    val rows = out.orderBy(col("doc_id")).collect()
    // contiguity: each doc starts exactly where the previous one ended
    val before = rows.map(r => r.getLong(2) * 256 + r.getLong(3)) // seq_id*cap + offset
    val toks = rows.map(_.getLong(1))
    (1 until rows.length).foreach { i =>
      assert(before(i) == before(i - 1) + toks(i - 1),
        s"doc ${rows(i).getLong(0)}: before=${before(i)} expected ${before(i - 1) + toks(i - 1)}")
    }
    // conservation: the last doc's end position equals the total token count
    assert(before.last + toks.last == toks.sum)
    // straddle flag consistent with the seq ids
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(4) > r.getLong(2)), r.toString)
    }
    // the engine's two-phase cumsum equals the specification's single
    // global window (stated directly here on the small fixture)
    val spec = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("before", coalesce(sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy(col("doc_id")).collect().map(_.getLong(2))
    assert(before.sameElements(spec))
    out.unpersist()
  }

  test("h1: the forest partitions the parts — root subtree rollups sum to the whole table") {
    val out = run("h1_hierarchy_rollup").cache()
    // every node reaches a root at depth 0, and roots are their own root
    assert(out.filter(col("depth") === 0 && col("root_key") =!= col("p_partkey")).count() == 0)
    // conservation: each part belongs to exactly one root's subtree, so
    // the root rows' subtree_retail adds up to the full table's retail
    val rootSum = out.filter(col("depth") === 0)
      .agg(sum(col("subtree_retail").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    val total = spark.read.parquet(s"$sf001/part.parquet")
      .agg(sum(col("p_retailprice").cast("decimal(12,2)"))).collect()(0).getDecimal(0)
    assert(rootSum.compareTo(total) == 0, s"rootSum=$rootSum total=$total")
    // subtree counts: a root's n_desc is the size of its subtree minus itself
    val byRoot = out.groupBy(col("root_key").as("rk")).agg(count(lit(1)).as("members"))
    val mismatch = out.filter(col("depth") === 0).as("r")
      .join(byRoot, col("r.p_partkey") === col("rk"))
      .filter(col("n_desc") =!= col("members") - 1).count()
    assert(mismatch == 0)
    out.unpersist()
  }

  test("s13: SCD2 intervals chain per customer — one current version, contiguous numbering, no gaps") {
    val out = run("s13_scd2_history").cache()
    val nCust = out.select(col("o_custkey")).distinct().count()
    // exactly one open (current) interval per customer
    assert(out.filter(col("is_current")).count() == nCust)
    // version numbers are 1..max contiguous per customer
    val vstats = out.groupBy(col("o_custkey"))
      .agg(min(col("version")).as("vmin"), max(col("version")).as("vmax"),
        count(lit(1)).as("n"))
    assert(vstats.filter(col("vmin") =!= 1 || col("vmax") =!= col("n")).count() == 0)
    // intervals chain: version k's valid_to equals version k+1's valid_from
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    val chained = out.withColumn("next_from", lead(col("valid_from"), 1).over(w))
    assert(chained.filter(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).count() == 0)
    // and consecutive versions always change the tracked attribute
    val flips = out.withColumn("next_prio", lead(col("o_orderpriority"), 1).over(w))
    assert(flips.filter(col("next_prio").isNotNull &&
      col("next_prio") === col("o_orderpriority")).count() == 0)
    out.unpersist()
  }
}
