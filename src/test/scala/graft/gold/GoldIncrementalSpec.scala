package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Incremental refresh must equal a full rebuild when applied to the
  * changed-key set — the maintenance invariant that lets the 100 TB
  * deployment skip full MV rebuilds.
  */
class GoldIncrementalSpec extends SparkTestBase {

  private def lineitem = Tables(spark, sf0001, "lineitem")

  /** The gold pipeline: per-order rollup, optionally restricted to keys. */
  private def buildGold(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("li_count"),
        sum(col("l_quantity").cast("long")).as("qty_tot"),
        max(col("l_shipdate")).as("last_ship"))

  test("incremental refresh over changed keys equals the full rebuild") {
    // initial state: gold built from the unmodified fact table
    val goldV1 = buildGold(lineitem).cache()

    // a delta lands: quantities double for every 50th order
    val changed = lineitem.filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey")).distinct().cache()
    val factV2 = lineitem.withColumn("l_quantity",
      when(col("l_orderkey") % 50 === 0, col("l_quantity") * 2)
        .otherwise(col("l_quantity"))).cache()

    val incremental = GoldIncremental.refresh(goldV1, changed, "l_orderkey") { keys =>
      buildGold(factV2.join(keys, Seq("l_orderkey"), "left_semi"))
    }
    val full = buildGold(factV2)

    assert(sameRows(incremental, full))
    // and the untouched parents were genuinely not recomputed: their rows
    // are byte-identical to v1
    val untouchedInc = incremental.join(changed, Seq("l_orderkey"), "left_anti")
    val untouchedV1 = goldV1.join(changed, Seq("l_orderkey"), "left_anti")
    assert(sameRows(untouchedInc, untouchedV1))
    goldV1.unpersist(); changed.unpersist(); factV2.unpersist()
  }

  test("a changed parent whose recompute returns zero rows drops its stale gold row") {
    val goldV1 = buildGold(lineitem).cache()
    // delta: every 40th order's children are DELETED from the fact table
    val changed = lineitem.filter(col("l_orderkey") % 40 === 0)
      .select(col("l_orderkey")).distinct().cache()
    val factV2 = lineitem.filter(col("l_orderkey") % 40 =!= 0).cache()

    val incremental = GoldIncremental.refresh(goldV1, changed, "l_orderkey") { keys =>
      buildGold(factV2.join(keys, Seq("l_orderkey"), "left_semi"))
    }
    val full = buildGold(factV2)

    // the recompute over the changed keys is genuinely empty…
    assert(factV2.join(changed, Seq("l_orderkey"), "left_semi").isEmpty)
    // …and the incremental result must equal the full rebuild: the stale
    // gold rows for the deleted parents are gone, not carried over
    assert(incremental.join(changed, Seq("l_orderkey"), "left_semi").isEmpty)
    assert(sameRows(incremental, full))
    goldV1.unpersist(); changed.unpersist(); factV2.unpersist()
  }

  test("anti-join strategy adapts: broadcast under the key budget, shuffle_hash above") {
    val goldV1 = buildGold(lineitem)
    val changed = lineitem.filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey")).distinct()
    def planOf(budget: String): String = {
      spark.conf.set("spark.graft.gold.broadcastMaxKeys", budget)
      try GoldIncremental.refresh(goldV1, changed, "l_orderkey") { keys =>
        buildGold(lineitem.join(keys, Seq("l_orderkey"), "left_semi"))
      }.queryExecution.sparkPlan.toString
      finally spark.conf.unset("spark.graft.gold.broadcastMaxKeys")
    }
    // generous budget: the slim key set broadcasts, the fat gold side
    // never moves (no exchange/sort feeding the anti-join)
    val broad = planOf("1000000")
    assert(broad.contains("BroadcastHashJoin") && broad.contains("LeftAnti"),
      s"expected broadcast anti-join under budget:\n$broad")
    // zero budget: the scale-safe path — hash-build the key side, stream
    // gold through one exchange, never a sort-merge over gold
    val shuffled = planOf("0")
    assert(shuffled.contains("ShuffledHashJoin") && shuffled.contains("LeftAnti"),
      s"expected shuffled-hash anti-join over budget:\n$shuffled")
    assert(!shuffled.contains("SortMergeJoin"),
      s"gold side must never sort-merge:\n$shuffled")
  }

  test("refresh with an empty changed set is the identity") {
    val goldV1 = buildGold(lineitem)
    val empty = lineitem.select(col("l_orderkey")).filter(lit(false))
    val out = GoldIncremental.refresh(goldV1, empty, "l_orderkey") { keys =>
      buildGold(lineitem.join(keys, Seq("l_orderkey"), "left_semi"))
    }
    assert(sameRows(out, goldV1))
  }

  test("child-grain MV with person history: naive parent-local refresh diverges, person-graph key expansion converges") {
    import graft.queries.GoldMvFull
    val li = lineitem.cache()
    val goldV1 = GoldMvFull.buildAccuseds(spark, sf0001, li, li).cache()

    // delta: every 40th crime is deleted outright. 40 ≡ 0 (mod 8), so the
    // deleted crimes hold NO child-grain gold rows themselves — their only
    // footprint is the person-history columns of rows in OTHER crimes.
    val liV2 = li.filter(col("l_orderkey") % 40 =!= 0).cache()
    val directly = li.filter(col("l_orderkey") % 40 === 0)
      .select(col("l_orderkey")).distinct().cache()
    val full = GoldMvFull.buildAccuseds(spark, sf0001, liV2, liV2).cache()

    def refreshWith(keys: org.apache.spark.sql.DataFrame) =
      GoldIncremental.refresh(goldV1,
        keys.select(col("l_orderkey").as("crime_id")), "crime_id") { ks =>
        GoldMvFull.buildAccuseds(spark, sf0001,
          liV2.join(ks.select(col("crime_id").as("l_orderkey")),
            Seq("l_orderkey"), "left_semi"),
          liV2) // history ALWAYS reads the full v2 fact table
      }

    // NAIVE: refresh only the directly-changed crimes. Untouched crimes
    // keep rows whose previously_involved still lists deleted crimes —
    // provably stale.
    val naive = refreshWith(directly)
    assert(!sameRows(naive, full),
      "naive refresh should diverge: person history is not parent-local")

    // EXPANDED: directly-changed crimes ∪ every crime of any person seen
    // in one — the closure of the history dependency (one hop suffices:
    // history depends only on person→crime membership).
    val affectedPersons = li.join(directly, Seq("l_orderkey"), "left_semi")
      .select(col("l_suppkey")).distinct()
    val expanded = directly.unionByName(
      li.join(affectedPersons, Seq("l_suppkey"), "left_semi")
        .select(col("l_orderkey")).distinct()).distinct()
    val inc = refreshWith(expanded)
    assert(sameRows(inc, full))
    Seq(li, goldV1, liV2, directly, full).foreach(_.unpersist())
  }

  test("incremental refresh of the FULL-breadth MV equals its full rebuild, incl. parent deletes") {
    import graft.queries.GoldMvFull
    val orders = Tables(spark, sf0001, "orders")
    // keep the fixture small so three full-breadth builds stay fast
    val scopeO = orders.filter(col("o_orderkey") % 3 === 0).cache()
    val scopeLi = lineitem.join(scopeO.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").cache()
    val goldV1 = GoldMvFull.buildFirsFull(spark, sf0001, scopeO, scopeLi).cache()

    // the delta touches all four child roles at once: quantities double
    // for %50 parents (accused qty + drug rollup), and %40 parents are
    // DELETED outright (orders AND children) — their recompute is empty
    // and the stale gold rows must drop
    val changed = scopeO.filter(col("o_orderkey") % 50 === 0 || col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey").as("id")).distinct().cache()
    val oV2 = scopeO.filter(col("o_orderkey") % 40 =!= 0).cache()
    val liV2 = scopeLi.filter(col("l_orderkey") % 40 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 50 === 0, col("l_quantity") * 2)
          .otherwise(col("l_quantity"))).cache()

    val incremental = GoldIncremental.refresh(goldV1, changed, "id") { keys =>
      // ONE key restriction prunes the parent scan and all four child
      // roles: the restricted lineitem frame feeds accused/drug/
      // chargesheet/document aggregates alike
      val ok = keys.select(col("id").as("o_orderkey"))
      val lk = keys.select(col("id").as("l_orderkey"))
      GoldMvFull.buildFirsFull(spark, sf0001,
        oV2.join(ok, Seq("o_orderkey"), "left_semi"),
        liV2.join(lk, Seq("l_orderkey"), "left_semi"))
    }
    val full = GoldMvFull.buildFirsFull(spark, sf0001, oV2, liV2)

    assert(sameRows(incremental, full))
    // deleted parents are gone from the incremental result
    assert(incremental.filter(col("id") % 40 === 0).isEmpty)
    // untouched parents were NOT recomputed: byte-identical to v1
    val untouchedInc = incremental.join(changed, Seq("id"), "left_anti")
    val untouchedV1 = goldV1.join(changed, Seq("id"), "left_anti")
    assert(sameRows(untouchedInc, untouchedV1))
    Seq(scopeO, scopeLi, goldV1, changed, oV2, liV2).foreach(_.unpersist())
  }
}
