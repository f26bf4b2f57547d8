package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property tests for the merge kernels — the laws the reference's sinks
  * guarantee (SURVEY.md §7.4 item 1): idempotency (Keep-1-record.sql
  * semantics: re-merging the same payload is a no-op) and the
  * null-preservation rules of the smart merge.
  */
class MergeKernelsSpec extends SparkTestBase {
  import spark.implicits._

  private type Rows = List[(Int, Option[String], Option[Int])]

  private val genRow: Gen[(Int, Option[String], Option[Int])] = for {
    pk <- Gen.choose(0, 15)
    a <- Gen.option(Gen.oneOf("x", "y", "z"))
    b <- Gen.option(Gen.choose(0, 3))
  } yield (pk, a, b)

  private val genRows: Gen[Rows] = Gen.listOfN(12, genRow)

  private def df(rows: Rows): DataFrame =
    rows.toDF("pk", "a", "b")
      // target/staged tables are keyed — keep one row per pk deterministically
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("pk")
          .orderBy(col("a").asc_nulls_first, col("b").asc_nulls_first)))
      .filter(col("__rn") === 1).drop("__rn")

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("S6 upsertClassify: re-merging the same payload yields only no_change/kept") {
    check(Prop.forAll(genRows, genRows) { (t0, s0) =>
      val merged = MergeKernels.upsertClassify(df(t0), df(s0), Seq("pk")).cache()
      val again = MergeKernels.upsertClassify(merged.drop("op"), df(s0), Seq("pk"))
      val bad = again.filter(!col("op").isin("no_change", "kept")).count()
      merged.unpersist()
      bad == 0L
    })
  }

  test("S6 upsertClassify: staged rows win for every staged pk; target-only rows kept verbatim") {
    check(Prop.forAll(genRows, genRows) { (t0, s0) =>
      val tDf = df(t0); val sDf = df(s0)
      val merged = MergeKernels.upsertClassify(tDf, sDf, Seq("pk")).cache()
      val stagedPart = merged.filter(col("op") =!= "kept").drop("op")
      val keptPart = merged.filter(col("op") === "kept").drop("op")
      val expectKept = tDf.join(sDf.select("pk"), Seq("pk"), "left_anti")
      val ok = sameRows(stagedPart, sDf) && sameRows(keptPart, expectKept)
      merged.unpersist()
      ok
    })
  }

  test("S7 smartMerge: never nulls out an existing value (non-overwrite columns)") {
    check(Prop.forAll(genRows, genRows) { (t0, s0) =>
      val tDf = df(t0).cache()
      val merged = MergeKernels.smartMerge(tDf, df(s0), Seq("pk"))
      // a result column may be NULL only if the target value was NULL too
      val lost = merged.alias("m").join(tDf.alias("t"), "pk")
        .filter((col("m.a").isNull && col("t.a").isNotNull) ||
                (col("m.b").isNull && col("t.b").isNotNull))
        .count()
      tDf.unpersist()
      lost == 0L
    })
  }

  test("S7 smartMerge: idempotent — merging the same payload twice equals once") {
    check(Prop.forAll(genRows, genRows) { (t0, s0) =>
      val sDf = df(s0)
      val once = MergeKernels.smartMerge(df(t0), sDf, Seq("pk")).cache()
      val twice = MergeKernels.smartMerge(once, sDf, Seq("pk"))
      val ok = sameRows(once, twice)
      once.unpersist()
      ok
    })
  }

  test("S7 smartMerge: overwrite columns always take the staged value on matched rows") {
    check(Prop.forAll(genRows, genRows) { (t0, s0) =>
      val tDf = df(t0); val sDf = df(s0)
      val merged = MergeKernels.smartMerge(tDf, sDf, Seq("pk"), overwriteCols = Set("b"))
      // for every pk present in BOTH frames, result.b must equal staged.b
      // (even when staged.b is NULL — dates are always overwritten)
      val matched = merged.alias("m")
        .join(sDf.alias("s"), "pk")
        .join(tDf.select("pk"), "pk")
      matched.filter(!(col("m.b") <=> col("s.b"))).count() == 0L
    })
  }

  test("pending-FK split partitions children exactly: valid ⊎ pending ≡ children") {
    check(Prop.forAll(genRows, genRows) { (c0, p0) =>
      val children = df(c0)
      val parents = df(p0).select(col("pk").as("parent_pk"))
      val res = PendingFk.split(children, parents, fk = "pk", parentKey = "parent_pk",
        attempt = 1)
      val reunion = res.valid.unionByName(res.pending.drop("fk_attempts"))
      sameRows(reunion, children) &&
        res.valid.join(res.pending, Seq("pk"), "inner").isEmpty
    })
  }

  test("S8 childReplace: staged parents carry exactly the staged children; others untouched") {
    val tgt = Seq((1, "old1"), (1, "old2"), (2, "keep"), (3, "keep3")).toDF("parent", "v")
    val stg = Seq((1, "new1"), (4, "new4")).toDF("parent", "v")
    val out = MergeKernels.childReplace(tgt, stg, "parent").cache()
    assert(out.filter(col("parent") === 1).collect().map(_.getString(1)).toSet == Set("new1"))
    assert(out.filter(col("parent") === 4).count() == 1)
    assert(out.filter(col("parent").isin(2, 3)).count() == 2)
    out.unpersist()
  }

  test("S9 appendIfAbsent: idempotent and keeps target rows verbatim") {
    check(Prop.forAll(genRows, genRows) { (t0, s0) =>
      val tDf = df(t0); val sDf = df(s0)
      val once = MergeKernels.appendIfAbsent(tDf, sDf, Seq("pk"), Seq(col("a").asc_nulls_first))
        .cache()
      val twice = MergeKernels.appendIfAbsent(once, sDf, Seq("pk"), Seq(col("a").asc_nulls_first))
      val ok = sameRows(once, twice) && once.exceptAll(tDf).count() == (once.count() - tDf.count())
      once.unpersist()
      ok
    })
  }

  test("S10 stubRows: every referenced key resolves afterwards; stubs are all-NULL") {
    val tgt = Seq((1, Some("a")), (2, Some("b"))).toDF("pk", "v")
    val refs = Seq(2, 3, 4, 4).toDF("fk")
    val out = MergeKernels.stubRows(tgt, refs, "pk").cache()
    assert(out.count() == 4)
    assert(refs.select(col("fk").as("pk")).distinct()
      .join(out, Seq("pk"), "left_anti").count() == 0)
    assert(out.filter(col("pk").isin(3, 4)).filter(col("v").isNotNull).count() == 0)
    out.unpersist()
  }

  test("SCD2 scd2Merge: close-and-reopen on change, insert on new, no-op on same, history untouched") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val current = Seq(
      // pk 1: live row whose attr the batch changes + one closed history row
      (1L, "a", d("1990-01-01"), d("1995-01-01"), false),
      (1L, "b", d("1995-01-01"), d("9999-12-31"), true),
      // pk 2: live row the batch repeats verbatim
      (2L, "x", d("1990-01-01"), d("9999-12-31"), true),
      // pk 3: live row the batch never mentions
      (3L, "y", d("1990-01-01"), d("9999-12-31"), true)
    ).toDF("pk", "attr", "valid_from", "valid_to", "is_current")
    val batch = Seq((1L, "c"), (2L, "x"), (9L, "z")).toDF("pk", "attr")
    val out = MergeKernels.scd2Merge(
      current, batch, "pk", Seq("attr"), lit("2000-06-01").cast("date")).cache()

    // exactly one open version per key, never more
    assert(out.filter(col("is_current")).groupBy("pk").count()
      .filter(col("count") > 1).count() == 0)
    // pk 1: old history row untouched, changed row closed at effective, new version open
    val p1 = out.filter(col("pk") === 1).collect()
    assert(p1.length == 3)
    assert(p1.exists(r => r.getString(1) == "b" && r.getDate(3) == d("2000-06-01")
      && !r.getBoolean(4)))
    assert(p1.exists(r => r.getString(1) == "c" && r.getDate(2) == d("2000-06-01")
      && r.getBoolean(4)))
    assert(p1.exists(r => r.getString(1) == "a" && r.getDate(3) == d("1995-01-01")))
    // pk 2 unchanged: single verbatim row; pk 3 untouched; pk 9 inserted open
    assert(out.filter(col("pk") === 2).count() == 1)
    assert(out.filter(col("pk") === 3 && col("valid_to") === d("9999-12-31")).count() == 1)
    assert(out.filter(col("pk") === 9 && col("is_current")
      && col("valid_from") === d("2000-06-01")).count() == 1)
    // validity intervals never overlap per key: close date of the old
    // version equals the open date of its successor
    assert(out.count() == 6)
    out.unpersist()
  }
}
