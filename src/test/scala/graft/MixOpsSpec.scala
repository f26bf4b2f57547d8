package graft

/** Semantics the DuckDB oracle can't state: the mixture planner's budget
  * algebra, the saturation curve's conservation laws, and the golden
  * record's modal-vote property against a direct recomputation.
  */
class MixOpsSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("dd50: mixture weights are a distribution and caps bind exactly at 4 epochs") {
    val rows = q("dd50_mix_epochs").collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"mix weights sum to $wsum")
    rows.foreach { r =>
      val (avail, epochs, capped, eff) =
        (r.getLong(1), r.getDouble(3), r.getBoolean(4), r.getLong(5))
      assert(epochs > 0 && epochs <= 4.0 + 1e-9)
      if (capped) assert(math.abs(epochs - 4.0) < 1e-9, "capped row not at the cap")
      assert(math.abs(eff - epochs * avail) <= 1.0, "effective tokens != epochs*avail")
    }
    // temperature sampling flattens but preserves order: more available
    // tokens never means a SMALLER mixture weight
    val byAvail = rows.sortBy(_.getLong(1))
    byAvail.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(2) + 1e-9,
        "sqrt weighting must be monotone in availability")
    }
  }

  test("dd51: saturation curve conserves the distinct-gram count and starts fully novel") {
    import org.apache.spark.sql.functions._
    val rows = q("dd51_gram_saturation").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq, "tranches 0..k-1")
    // bucket 0: every one of its DISTINCT grams is first-seen (instances
    // can exceed that — the same gram may appear in several tranche-0 docs)
    val docs = graft.core.Tables(spark, sf0001, "documents")
    val m = docs.agg(max(col("doc_id")) + 1).head.getLong(0)
    val tranche0Distinct = docs
      .filter(col("doc_id") * 10 / m < 1)
      .select(explode(array_distinct(graft.functions.NativeExpressions
        .ngrams_native(split(col("text"), " "), 8))).as("g"))
      .select(countDistinct(col("g"))).head.getLong(0)
    assert(rows.head.getLong(2) == tranche0Distinct)
    // cum = running sum of new; final cum = global distinct gram count
    val cums = rows.scanLeft(0L)((acc, r) => acc + r.getLong(2)).drop(1)
    rows.zip(cums).foreach { case (r, c) => assert(r.getLong(3) == c) }
    val totalDistinct = graft.core.Tables(spark, sf0001, "documents")
      .select(explode(array_distinct(graft.functions.NativeExpressions
        .ngrams_native(split(col("text"), " "), 8))).as("g"))
      .select(countDistinct(col("g"))).head.getLong(0)
    assert(rows.last.getLong(3) == totalDistinct,
      "final cumulative != corpus distinct grams")
    // novelty can only be a fraction of instances
    rows.foreach(r => assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0))
  }

  test("dd56: shared fingerprint counts match a direct set intersection per source pair") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("dd56_source_overlap")(spark, sf001).collect()
    assert(out.nonEmpty, "no cross-source overlap found at sf0.01")
    val bySource = graft.core.Tables(spark, sf001, "documents")
      .select(col("source"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("fp"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    out.foreach { r =>
      val (sa, sb) = (bySource(r.getAs[String]("source_a")),
        bySource(r.getAs[String]("source_b")))
      val shared = (sa & sb).size
      assert(r.getAs[Long]("shared") == shared,
        s"${r.getAs[String]("source_a")}x${r.getAs[String]("source_b")}: " +
          s"shared=${r.getAs[Long]("shared")} brute=$shared")
      assert(r.getAs[Long]("nf_a") == sa.size && r.getAs[Long]("nf_b") == sb.size)
    }
    // every pair appears at most once and in canonical order
    val keys = out.map(r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    assert(keys.distinct.length == keys.length)
    keys.foreach { case (x, y) => assert(x < y) }
  }

  test("dd59: leaked counts match a direct split-set intersection") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("dd59_split_leakage")(spark, sf001).collect()
    assert(out.nonEmpty)
    val b = conv(substring(md5(concat(lit("split#"), col("doc_id").cast("string"))),
      1, 2), 16, 10).cast("long")
    val bySplit = graft.core.Tables(spark, sf001, "documents")
      .select(array_join(slice(split(col("text"), " "), 1, 8), " ").as("fp"),
        when(b < 204, "train").when(b < 230, "val").otherwise("test").as("split"))
      .collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getString(0)).toSet).toMap
    out.foreach { r =>
      val inter = (bySplit(r.getAs[String]("split_a")) &
        bySplit(r.getAs[String]("split_b"))).size
      assert(r.getAs[Long]("leaked") == inter,
        s"${r.getAs[String]("split_a")}x${r.getAs[String]("split_b")}: " +
          s"leaked=${r.getAs[Long]("leaked")} brute=$inter")
    }
  }

  test("dd58: pair frequencies match a direct vocabulary sweep") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("dd58_bpe_pairs")(spark, sf0001).collect()
    assert(out.length == 20)
    val vocab = graft.core.Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val freqs = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, c) =>
      w.sliding(2).foreach(p => freqs(p) += c)
    }
    val expected = freqs.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
    out.zip(expected).foreach { case (r, (p, f)) =>
      assert(r.getString(0) == p && r.getLong(1) == f,
        s"got (${r.getString(0)},${r.getLong(1)}) want ($p,$f)")
    }
  }

  test("e7: the elected segment is a true mode of its cluster, recomputed directly") {
    import org.apache.spark.sql.functions._
    val out = q("e7_golden_record").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    val direct = graft.core.Tables(spark, sf0001, "customer")
      .select(col("c_mktsegment"), col("c_name"), col("c_acctbal"),
        md5(concat_ws("|", col("c_nationkey"),
          floor(col("c_acctbal") / 500).cast("long"))).as("cid"))
      .collect().groupBy(_.getString(3))
      .filter(_._2.length >= 2)
    assert(direct.keySet == out.keySet, "cluster sets differ")
    direct.foreach { case (cid, members) =>
      val r = out(cid)
      assert(r.getLong(1) == members.length)
      val counts = members.groupBy(_.getString(0)).view.mapValues(_.length).toMap
      val maxC = counts.values.max
      // winner must hold the max count; among max-count ties, the
      // lexicographically smallest value
      val winner = counts.filter(_._2 == maxC).keys.min
      assert(r.getString(2) == winner, s"cluster $cid: wrong modal segment")
      assert(math.abs(r.getDouble(3) - maxC.toDouble / members.length) < 1e-6)
      assert(r.getString(4) == members.map(_.getString(1)).min)
      assert(math.abs(r.getDouble(5) - members.map(_.getDouble(2)).max) < 1e-12)
    }
  }
}
