package graft

import org.apache.spark.sql.Row

/** Semantics checks for the time-series ops that the DuckDB oracle can't
  * prove on its own: the 10-tap EWMA truncation against the true serial
  * recursion, MAD's breakdown robustness, and CUBE's grouping-set algebra.
  */
class SeriesOpsSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("w20: truncated EWMA tracks the exact adjusted EWMA within tap precision") {
    val rows = q("w20_ewma_smoothing")
      .collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val series = rs.sortBy(_.getTimestamp(1).getTime).map(_.getDouble(2))
      val got = rs.sortBy(_.getTimestamp(1).getTime).map(_.getDouble(3))
      // exact adjust-normalized EWMA (pandas ewm(adjust=True)):
      // y_i = sum_k 0.7^k x_{i-k} / sum_k 0.7^k over ALL k <= i — the
      // query truncates at 10 taps, dropping <= 0.7^10/(1-0.7^{i+1})
      // ≈ 2.83% of the weight mass
      val exact = series.indices.map { i =>
        val ws = (0 to i).map(k => math.pow(0.7, k))
        val num = (0 to i).map(k => ws(k) * series(i - k)).sum
        num / ws.sum
      }
      val range = series.max - series.min
      exact.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(math.abs(e - g) <= 0.0283 * range + 1e-6,
          s"tap-truncated EWMA drifted at index $i: exact=$e got=$g")
      }
      // first observation: EWMA equals the observation itself
      assert(math.abs(got.head - series.head) < 1e-6)
    }
  }

  test("w20: EWMA is a convex combination — always inside the trailing-window envelope") {
    q("w20_ewma_smoothing").collect().groupBy(_.getString(0)).foreach {
      case (_, rs) =>
        val ordered = rs.sortBy(_.getTimestamp(1).getTime)
        ordered.zipWithIndex.foreach { case (r, i) =>
          val window = ordered.slice(math.max(0, i - 9), i + 1).map(_.getDouble(2))
          assert(r.getDouble(3) >= window.min - 1e-6 &&
            r.getDouble(3) <= window.max + 1e-6,
            "EWMA left the convex hull of its own taps")
        }
    }
  }

  test("w21: MAD flags match a direct median computation") {
    val out = q("w21_mad_outliers").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    // recompute per type from the raw events with plain Scala
    val daily = Tables(spark)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    daily.foreach { case (tpe, xs) =>
      val med = math.rint(median(xs) * 1e6) / 1e6
      val devs = xs.map(x => math.rint(math.abs(x - med) * 1e6) / 1e6)
      val mad = math.rint(median(devs) * 1e6) / 1e6
      val nOut = devs.count(_ > 3.0 * mad)
      val r = out(tpe)
      assert(r.getLong(1) == xs.length, s"$tpe n_days")
      assert(math.abs(r.getDouble(2) - med) < 1e-6, s"$tpe median")
      assert(math.abs(r.getDouble(3) - mad) < 1e-6, s"$tpe mad")
      assert(r.getLong(4) == nOut, s"$tpe outlier count")
    }
  }

  /** Daily per-type totals recomputed independently of the query under test. */
  private def Tables(s: org.apache.spark.sql.SparkSession): Map[String, Seq[Double]] = {
    import org.apache.spark.sql.functions._
    graft.core.Tables(s, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("x"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.toSeq.map(_.getDouble(2)) }
  }

  test("w22: RANGE frame is calendar-true — brute-forced over each type's day series") {
    val rows = q("w22_range_frame_sum").collect().groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val series = rs.map(r => (r.getTimestamp(1).getTime / 86400000L,
        r.getDouble(2), r.getDouble(3), r.getLong(4))).sortBy(_._1)
      series.foreach { case (day, _, trailing, inFrame) =>
        val window = series.filter(s => s._1 >= day - 6 && s._1 <= day)
        assert(inFrame == window.length, s"days_in_frame at $day")
        assert(math.abs(trailing - window.map(_._2).sum) < 1e-6,
          s"trailing sum at $day")
        assert(inFrame <= 7)
      }
    }
  }

  test("w23: merged spans match a sequential sweep over each supplier's intervals") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("w23_interval_merge")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    val ivs = graft.core.Tables(spark, sf0001, "lineitem")
      .filter(col("l_suppkey") % 25 === 0)
      .select(col("l_suppkey"), to_date(col("l_shipdate")).as("s"),
        date_add(to_date(col("l_shipdate")),
          (col("l_quantity").cast("long") % 14).cast("int")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDate(2).toLocalDate.toEpochDay))
      .groupBy(_._1)
    assert(ivs.keySet == out.keySet)
    ivs.foreach { case (supp, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      // sequential sweep merge
      var spans = List.empty[(Long, Long)]
      sorted.foreach { case (s0, e0) =>
        spans match {
          case (hs, he) :: rest if s0 <= he =>
            spans = (hs, math.max(he, e0)) :: rest
          case _ => spans = (s0, e0) :: spans
        }
      }
      val r = out(supp)
      assert(r.getLong(1) == rows.length, s"supp $supp n_intervals")
      assert(r.getLong(2) == spans.length, s"supp $supp n_spans")
      assert(r.getLong(3) == spans.map(sp => sp._2 - sp._1 + 1).sum,
        s"supp $supp covered_days")
      assert(r.getLong(4) == spans.map(sp => sp._2 - sp._1 + 1).max,
        s"supp $supp longest_span")
    }
  }

  test("w24: growth percentages reproduce from the yearly revenue series") {
    val rows = SparkEntry.queries("w24_yoy_growth")(spark, sf0001).collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val series = rs.sortBy(_.getInt(1))
      assert(series.head.isNullAt(3) && series.head.isNullAt(4),
        "first recorded year must have no prior")
      series.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(math.abs(cur.getDouble(3) - prev.getDouble(2)) < 1e-9,
            "prev_revenue chain broken")
          val expect = (cur.getDouble(2) - prev.getDouble(2)) * 100 /
            prev.getDouble(2)
          assert(math.abs(cur.getDouble(4) - expect) < 1e-6, "yoy mismatch")
        case _ =>
      }
    }
  }

  test("a22: CUBE grouping sets are mutually consistent") {
    val rows = q("a22_cube_grouping").collect()
    def slice(gid: Int): Array[Row] = rows.filter(_.getInt(2) == gid)
    val detail = slice(0)
    val byNation = slice(1) // year grouped away
    val byYear = slice(2) // nation grouped away
    val grand = slice(3)
    assert(grand.length == 1)
    // each subtotal layer reproduces the grand total count
    val total = grand.head.getLong(4)
    assert(detail.map(_.getLong(4)).sum == total)
    assert(byNation.map(_.getLong(4)).sum == total)
    assert(byYear.map(_.getLong(4)).sum == total)
    // per-nation subtotal equals the sum of its detail cells
    val detailByNation = detail.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(4)).sum).toMap
    byNation.foreach { r =>
      assert(detailByNation(r.getString(0)) == r.getLong(4),
        s"nation ${r.getString(0)} subtotal != sum of detail")
    }
    // monetary totals agree within double-rendering noise
    val grandTotal = grand.head.getDouble(3)
    assert(math.abs(detail.map(_.getDouble(3)).sum - grandTotal) < 1e-4)
  }
}
