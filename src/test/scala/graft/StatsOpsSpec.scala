package graft

/** Brute-force recomputation checks for the StatsOps family: each test
  * re-derives the statistic from first principles on collected sf0.001
  * rows (naive ranks / ECDFs / pairwise slopes — fine at test scale,
  * exactly what the engine's count-space forms must NOT do at 100 TB)
  * and compares against the engine's two-phase formulation.
  */
class StatsOpsSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  private def table(name: String) =
    graft.core.Tables(spark, sf0001, name)

  test("a26: U and z match a naive average-rank computation") {
    import org.apache.spark.sql.functions._
    val rows = table("customer")
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
      .select(col("c_mktsegment"), round(col("c_acctbal"), 2))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2)))
    val sorted = rows.map(_._2).sorted
    // average rank per value (1-based, ties share the mean rank)
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1.0).sum / g.size }
    val ra = rows.filter(_._1 == "AUTOMOBILE").map(r => rankOf(r._2)).sum
    val na = rows.count(_._1 == "AUTOMOBILE").toLong
    val nb = rows.count(_._1 == "BUILDING").toLong
    val uA = ra - na * (na + 1) / 2.0
    val n = na + nb
    val tieT = rows.groupBy(_._2).values.map(g => math.pow(g.size, 3) - g.size).sum
    val sigma2 = na * nb / 12.0 * ((n + 1) - tieT / (n.toDouble * (n - 1)))
    val zExp = (uA - na * nb / 2.0) / math.sqrt(sigma2)

    val got = q("a26_mann_whitney").collect().head
    assert(got.getLong(0) == na && got.getLong(1) == nb)
    assert(math.abs(got.getDouble(2) - uA) < 0.51, s"u_a ${got.getDouble(2)} vs $uA")
    assert(math.abs(got.getDouble(4) - zExp) < 1e-4, s"z ${got.getDouble(4)} vs $zExp")
  }

  test("a27: D equals the naive max ECDF gap and lives in [0,1]") {
    import org.apache.spark.sql.functions._
    val rows = table("orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"), round(col("o_totalprice"), 2))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = rows.filter(_._1 == "1-URGENT").map(_._2).sorted
    val b = rows.filter(_._1 == "5-LOW").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    val dExp = values.map { v =>
      val fa = a.count(_ <= v).toDouble / a.size
      val fb = b.count(_ <= v).toDouble / b.size
      math.abs(fa - fb)
    }.max
    val got = q("a27_ks_test").collect().head
    val d = got.getDouble(2)
    assert(d >= 0 && d <= 1)
    assert(math.abs(d - dExp) < 1e-6, s"d_stat $d vs naive $dExp")
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
  }

  test("a28: sen slope equals the naive median of pairwise slopes per segment") {
    import org.apache.spark.sql.functions._
    val monthly = table("orders")
      .join(table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .agg(sum(round(col("o_totalprice"), 2)).as("rev"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = q("a28_theil_sen").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty && got.keySet == monthly.keySet)
    monthly.foreach { case (seg, ms) =>
      val pts = ms.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.size
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
      val mid =
        if (slopes.size % 2 == 1) slopes(slopes.size / 2)
        else {
          val lo = slopes(slopes.size / 2 - 1); val hi = slopes(slopes.size / 2)
          lo + (hi - lo) * 0.5
        }
      val (nMonths, nPairs, sen) = got(seg)
      assert(nMonths == pts.size.toLong)
      assert(nPairs == slopes.size.toLong)
      // engine revenue is DECIMAL-exact; the naive double sum above can
      // drift in the last ulps, so compare loosely relative to magnitude
      assert(math.abs(sen - mid) <= 1e-6 * math.max(1.0, math.abs(mid)),
        s"$seg: sen $sen vs naive $mid")
    }
  }

  test("w33: acf values are bounded and lag-k pair counts shrink with k") {
    val rows = q("w33_acf").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9,
      s"acf out of range at k=${r.getInt(0)}"))
    val npairs = rows.map(_.getLong(1)).toSeq
    npairs.sliding(2).foreach { case Seq(x, y) => assert(y <= x) }
  }

  test("dd94: MI is non-negative, bounded by each entropy, NMI in [0,1]") {
    val r = q("dd94_mutual_info").collect().head
    val (mi, hx, hy, nmi) =
      (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-9)
    assert(nmi >= -1e-9 && nmi <= 1 + 1e-9)
    // brute recount from the raw table
    val docs = table("documents").select("lang", "source").collect()
      .map(r0 => (r0.getString(0), r0.getString(1)))
    val n = docs.length.toDouble
    val pxy = docs.groupBy(identity).view.mapValues(_.length / n)
    val px = docs.groupBy(_._1).view.mapValues(_.length / n)
    val py = docs.groupBy(_._2).view.mapValues(_.length / n)
    val miExp = pxy.map { case ((x, y), p) =>
      p * math.log(p / (px(x) * py(y)))
    }.sum
    assert(math.abs(mi - miExp) < 1e-6, s"mi $mi vs naive $miExp")
  }

  test("dd95: expected counts are Benford-consistent and chi2 re-derives") {
    val rows = q("dd95_benford").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val n = rs.map(_.getLong(2)).sum.toDouble
      rs.foreach { r =>
        val d = r.getInt(1)
        assert(d >= 1 && d <= 9)
        val exp = n * math.log10(1 + 1.0 / d)
        assert(math.abs(r.getDouble(3) - exp) < 0.01,
          s"expected count off for digit $d")
      }
      val chi2 = rs.map { r =>
        val e = r.getDouble(3); val o = r.getLong(2).toDouble
        (o - e) * (o - e) / e
      }.sum
      assert(math.abs(rs.head.getDouble(4) - chi2) < 0.01)
    }
  }

  test("dd96: skew metrics match a naive computation over collected key counts") {
    import org.apache.spark.sql.functions._
    val counts = table("orders").groupBy("o_custkey").count()
      .collect().map(_.getLong(1)).sorted
    val nKeys = counts.length.toLong
    val nRows = counts.sum
    val mean = nRows.toDouble / nKeys
    val gini = {
      val s = counts.zipWithIndex.map { case (c, i) => (i + 1).toLong * c }.sum
      2.0 * s / (nKeys * nRows.toDouble) - (nKeys + 1).toDouble / nKeys
    }
    def quant(p: Double): Long = {
      // smallest c with #(counts <= c) >= ceil(p * nKeys): positional pick
      // on the ascending array at index ceil(p*n)-1
      counts(math.ceil(p * nKeys).toInt - 1)
    }
    val r = q("dd96_skew_profile").collect().head
    assert(r.getLong(0) == nKeys && r.getLong(1) == nRows)
    assert(r.getLong(2) == counts.max)
    assert(math.abs(r.getDouble(3) - mean) < 1e-6)
    assert(r.getLong(4) == quant(0.5), s"p50 ${r.getLong(4)} vs ${quant(0.5)}")
    assert(r.getLong(5) == quant(0.99), s"p99 ${r.getLong(5)} vs ${quant(0.99)}")
    assert(math.abs(r.getDouble(9) - gini) < 1e-6, s"gini ${r.getDouble(9)} vs $gini")
  }

  test("dd97: vocabulary growth is monotone and the fit re-derives from the points") {
    val rows = q("dd97_heaps_law").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    rows.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b.getLong(3) >= a.getLong(3), "vocab must be non-decreasing")
      assert(b.getLong(2) >= a.getLong(2), "token count must be non-decreasing")
    }
    val xs = rows.map(r => math.log(r.getLong(2).toDouble))
    val ys = rows.map(r => math.log(r.getLong(3).toDouble))
    val n = xs.length
    val mx = xs.sum / n; val my = ys.sum / n
    val beta = (xs.zip(ys).map { case (x, y) => x * y }.sum - n * mx * my) /
      (xs.map(x => x * x).sum - n * mx * mx)
    assert(math.abs(rows.head.getDouble(4) - beta) < 1e-4)
    // sub-linear growth: a natural corpus keeps beta in (0, 1)
    assert(beta > 0 && beta < 1, s"heaps beta out of range: $beta")
  }

  test("a29: gini and decile shares match a naive sorted-cents computation") {
    import org.apache.spark.sql.functions._
    val cents = table("customer").filter(col("c_acctbal") > 0)
      .select((round(col("c_acctbal"), 2) * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val stot = cents.map(BigInt(_)).sum
    val ranksum = cents.zipWithIndex.map { case (v, k) => BigInt(v) * (k + 1) }.sum
    val giniExp = 2.0 * ranksum.toDouble / (n.toDouble * stot.toDouble) -
      (n + 1.0) / n
    val rows = q("a29_gini_lorenz").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10))
    rows.foreach { case (d, k, share, gini) =>
      assert(k == n * d / 10)
      val naive = cents.take(k.toInt).map(BigInt(_)).sum.toDouble / stot.toDouble
      assert(math.abs(share - naive) < 1e-5, s"decile $d: $share vs $naive")
      assert(math.abs(gini - giniExp) < 1e-5)
    }
    // Lorenz curve is convex-increasing and ends at exactly 1
    rows.map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) => assert(b >= a) }
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
  }

  test("w34: the split maximizes the naive SSE-reduction over all candidates") {
    import org.apache.spark.sql.functions._
    val days = table("orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .orderBy("d").collect().map(r => (r.getDate(0), r.getLong(1)))
    val ys = days.map(_._2)
    val s = ys.sum.toDouble
    val nd = ys.length
    def gain(i: Int): Double = {
      val cs = ys.take(i).sum.toDouble
      cs * cs / i + (s - cs) * (s - cs) / (nd - i) - s * s / nd
    }
    val best = (1 until nd).maxBy(i => (gain(i), -i))
    val got = q("w34_changepoint").collect().head
    assert(got.getLong(1) == best, s"split_idx ${got.getLong(1)} vs $best")
    assert(math.abs(got.getDouble(2) - gain(best)) < 1e-4)
    // the split day is the best-index day and the means re-derive
    assert(got.getTimestamp(0).toLocalDateTime.toLocalDate ==
      days(best - 1)._1.toLocalDate)
    assert(math.abs(got.getDouble(3) - ys.take(best).sum.toDouble / best) < 1e-5)
  }

  test("e17: the EM fixpoint re-derives from a driver-side replay") {
    import org.apache.spark.sql.functions._
    val keyed = table("documents")
      .select(col("lang"), (col("n_chars") / 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def cp(c: Long): Long = c * (c - 1) / 2
    val n = keyed.length.toLong
    val t = cp(n)
    val al = keyed.groupBy(_._1).values.map(g => cp(g.size)).sum
    val ac = keyed.groupBy(_._2).values.map(g => cp(g.size)).sum
    val alc = keyed.groupBy(identity).values.map(g => cp(g.size)).sum
    val (n11, n10, n01, n00) = (alc, al - alc, ac - alc, t - al - ac + alc)
    var (lam, ml, mc, ul, uc) = (0.01, 0.9, 0.9, 0.1, 0.1)
    for (_ <- 1 to 4) {
      def w(a: Int, b: Int): Double = {
        val pm = (if (a == 1) ml else 1.0 - ml) * (if (b == 1) mc else 1.0 - mc)
        val pu = (if (a == 1) ul else 1.0 - ul) * (if (b == 1) uc else 1.0 - uc)
        lam * pm / (lam * pm + (1.0 - lam) * pu)
      }
      val (w11, w10, w01, w00) = (w(1, 1), w(1, 0), w(0, 1), w(0, 0))
      val sw = n11 * w11 + n10 * w10 + n01 * w01 + n00 * w00
      val nl = (n11 * w11 + n10 * w10) / sw
      val ncb = (n11 * w11 + n01 * w01) / sw
      val nul = (n11 * (1.0 - w11) + n10 * (1.0 - w10)) / (t - sw)
      val nuc = (n11 * (1.0 - w11) + n01 * (1.0 - w01)) / (t - sw)
      lam = sw / t; ml = nl; mc = ncb; ul = nul; uc = nuc
    }
    val got = q("e17_fs_em").collect().head
    assert(got.getLong(0) == t && got.getLong(1) == n11 && got.getLong(4) == n00)
    assert(math.abs(got.getDouble(5) - lam) < 1e-6, s"lambda ${got.getDouble(5)} vs $lam")
    assert(math.abs(got.getDouble(6) - ml) < 1e-6)
    assert(math.abs(got.getDouble(8) - ul) < 1e-6)
    // the estimated weights must separate: agreement on a field should
    // carry positive match weight under any sane fixpoint here
    assert(got.getDouble(10) > 0 && got.getDouble(11) > 0)
  }
}
