package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch measurement main for the firs_mv expression-cost attribution
  * (optimization round; deleted once the numbers are recorded in
  * OPTIMIZATION_r11.md). Times the fused collect_list aggregate with
  * output expressions toggled on one family at a time, min-of-3 each.
  */
object LabFirs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def t(n: String) = Tables(spark, dir, n)
    val part = broadcast(t("part").select("p_partkey", "p_brand", "p_name"))
    val supp = broadcast(t("supplier").select("s_suppkey", "s_name"))
    def enriched = t("lineitem")
      .join(part, col("l_partkey") === col("p_partkey"), "left")
      .join(supp, col("l_suppkey") === col("s_suppkey"), "left")
      .select(col("l_orderkey"), struct(
        col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"),
        col("l_suppkey").as("sk"),
        col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls"),
        col("l_quantity").cast("long").as("qty"),
        col("p_brand").as("brand"),
        col("p_name").as("pname"),
        col("s_name").as("sname")).as("it"))
    def grouped = enriched.groupBy(col("l_orderkey"))
      .agg(collect_list(col("it")).as("items"))

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    val items = col("items")
    def time(name: String)(df: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val m = (1 to 3).map(_ => once()).min
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), m)
    }

    // pieces lifted from GoldMvFull.buildFirsFull
    val statusNorm: Column => Column = x =>
      when(x.getField("rf") === "R", "Returned")
        .when(x.getField("rf") === "A", "Adjusted")
        .when(x.getField("rf") === "N" && x.getField("ls") === "O", "Open")
        .otherwise("Unknown")
    val accusedJs: Column => Column = x => concat(
      lit("{\"personCode\":\"L-"), x.getField("ln"),
      lit("\",\"partId\":"), x.getField("pk"),
      lit(",\"status\":\""), statusNorm(x), lit("\"}"))
    def arrOrdered(items: Column, k0: Column => Column, k1: Column => Column,
        js: Column => Column): Column =
      concat(lit("["), array_join(transform(
        array_sort(transform(items,
          x => struct(k0(x).as("k0"), k1(x).as("k1"), js(x).as("js")))),
        kx => kx.getField("js")), ","), lit("]"))
    def arrDistinct(rendered: Column): Column =
      concat(lit("["), array_join(array_sort(array_distinct(rendered)), ","),
        lit("]"))
    def cnt(items: Column, p: Column => Column): Column =
      size(filter(items, p)).cast("long")
    val isDisp: Column => Column = x => x.getField("ls") === "F"
    val fileJsA = transform(filter(items, x => x.getField("rf") === "R"),
      x => concat(lit("{\"filePath\":\"/files/"), x.getField("pk"),
        lit(".pdf\",\"type\":\"FIR_COPY\",\"isDownloaded\":false}")))
    val fileJsB = transform(filter(items, x => x.getField("ls") === "O"),
      x => concat(lit("{\"filePath\":\"/generated/chargesheets/"), x.getField("sk"),
        lit("/"), x.getField("pk"),
        lit("\",\"type\":\"CHARGESHEET_FILE\",\"isDownloaded\":true}")))
    val dItems = filter(items, x =>
      x.getField("brand").isNotNull && x.getField("brand") =!= "Brand#17")
    val dPairs = array_sort(array_distinct(transform(dItems,
      x => struct(x.getField("brand").as("b"), x.getField("rf").as("f")))))
    def qtyDisplay(qty: Column): Column =
      when(qty >= 100,
        concat((qty.cast("decimal(15,2)") / 100).cast("decimal(18,2)").cast("string"),
          lit(" H units")))
        .when(qty > 0, concat(qty.cast("string"), lit(" units")))
        .otherwise("N/A")
    val drugWithQty = transform(dPairs, p => {
      val qsum = aggregate(
        filter(dItems, x => x.getField("brand") === p.getField("b") &&
          x.getField("rf") === p.getField("f")),
        lit(0L), (acc, x) => acc + x.getField("qty"))
      concat(lit("{\"name\":\""), p.getField("b"),
        lit("\",\"form\":\""), p.getField("f"),
        lit("\",\"quantity\":\""), qtyDisplay(qsum), lit("\"}"))
    })
    val cItems = filter(items, x =>
      x.getField("sname").isNotNull && x.getField("pname").isNotNull)
    val cSups = array_sort(array_distinct(transform(cItems,
      x => struct(x.getField("sk").as("sk"), x.getField("sname").as("sn")))))
    val accJs: Column => Column = x => concat(
      lit("{\"personId\":"), x.getField("pk"),
      lit(",\"value\":\""), x.getField("pname"),
      lit("\",\"chargeStatus\":\""),
      when(x.getField("rf") === "R", "Charged")
        .when(x.getField("rf") === "A", "Dropped")
        .otherwise("Pending"),
      lit("\"}"))
    val actJs: Column => Column = x => concat(
      lit("{\"partkey\":"), x.getField("pk"),
      lit(",\"name\":\""), x.getField("pname"),
      lit("\",\"qty\":"), x.getField("qty"), lit("}"))
    val csArr = transform(cSups, sup => {
      val sub = filter(cItems, x => x.getField("sk") === sup.getField("sk"))
      concat(lit("{\"id\":"), sup.getField("sk"),
        lit(",\"value\":\""), sup.getField("sn"),
        lit("\",\"acts\":"), arrOrdered(sub, _.getField("ln"), _.getField("pk"), actJs),
        lit(",\"accuseds\":"), arrDistinct(transform(sub, accJs)), lit("}"))
    })
    val assocArr = transform(cSups, sup => concat(
      lit("{\"id\":"), sup.getField("sk"),
      lit(",\"value\":\""), sup.getField("sn"), lit("\"}")))

    // variants: materialize the filtered/distinct intermediate arrays as
    // projection columns so each is computed ONCE per row instead of
    // re-evaluated inside every HOF lambda reference (no CSE there).
    for (_ <- 1 to 3) {
      time("drug_mat") {
        val g2 = grouped
          .withColumn("d_items", dItems)
          .withColumn("d_pairs", array_sort(array_distinct(transform(col("d_items"),
            x => struct(x.getField("brand").as("b"), x.getField("rf").as("f"))))))
        val dwq = transform(col("d_pairs"), p => {
          val qsum = aggregate(
            filter(col("d_items"), x => x.getField("brand") === p.getField("b") &&
              x.getField("rf") === p.getField("f")),
            lit(0L), (acc, x) => acc + x.getField("qty"))
          concat(lit("{\"name\":\""), p.getField("b"),
            lit("\",\"form\":\""), p.getField("f"),
            lit("\",\"quantity\":\""), qtyDisplay(qsum), lit("\"}"))
        })
        g2.select(col("l_orderkey"),
          arrDistinct(transform(col("d_items"),
            x => concat(lit("\""), upper(x.getField("brand")), lit("\"")))),
          concat(lit("["), array_join(dwq, ","), lit("]")))
      }
      time("chargesheets_mat") {
        val g2 = grouped
          .withColumn("c_items", cItems)
          .withColumn("c_sups", array_sort(array_distinct(transform(col("c_items"),
            x => struct(x.getField("sk").as("sk"), x.getField("sname").as("sn"))))))
        val cs2 = transform(col("c_sups"), sup => {
          val sub = filter(col("c_items"), x => x.getField("sk") === sup.getField("sk"))
          concat(lit("{\"id\":"), sup.getField("sk"),
            lit(",\"value\":\""), sup.getField("sn"),
            lit("\",\"acts\":"), arrOrdered(sub, _.getField("ln"), _.getField("pk"), actJs),
            lit(",\"accuseds\":"), arrDistinct(transform(sub, accJs)), lit("}"))
        })
        val as2 = transform(col("c_sups"), sup => concat(
          lit("{\"id\":"), sup.getField("sk"),
          lit(",\"value\":\""), sup.getField("sn"), lit("\"}")))
        g2.select(col("l_orderkey"),
          concat(lit("["), array_join(cs2, ","), lit("]")),
          concat(lit("["), array_join(as2, ","), lit("]")))
      }
      time("countsObj_mat") {
        val g2 = grouped
          .withColumn("dk", transform(filter(items, isDisp), x => x.getField("rf")))
        val keys = col("dk")
        g2.select(col("l_orderkey"),
          concat(lit("{"),
            array_join(transform(array_sort(array_distinct(keys)),
              k => concat(lit("\""), k, lit("\":"), size(filter(keys, x => x === k)))), ","),
            lit("}")))
      }
      time("exchange+collect_only") {
        grouped.select(col("l_orderkey"), size(items).as("n"))
      }
      time("counters") {
        grouped.select(col("l_orderkey"),
          cnt(items, x => isDisp(x) && x.getField("rf") === "R"),
          cnt(items, x => isDisp(x) && x.getField("rf") === "A"),
          cnt(items, isDisp),
          aggregate(items, lit(0L), (acc, x) => acc + x.getField("qty")))
      }
      time("accused_details") {
        grouped.select(col("l_orderkey"),
          arrOrdered(items, _.getField("ln"), _.getField("pk"), accusedJs))
      }
      time("documents") {
        grouped.select(col("l_orderkey"), arrDistinct(concat(fileJsA, fileJsB)))
      }
      time("drug_type+qty") {
        grouped.select(col("l_orderkey"),
          arrDistinct(transform(dItems,
            x => concat(lit("\""), upper(x.getField("brand")), lit("\"")))),
          concat(lit("["), array_join(drugWithQty, ","), lit("]")))
      }
      time("chargesheets+assoc") {
        grouped.select(col("l_orderkey"),
          concat(lit("["), array_join(csArr, ","), lit("]")),
          concat(lit("["), array_join(assocArr, ","), lit("]")))
      }
      time("disp_flags_countsObj") {
        val keys = transform(filter(items, isDisp), x => x.getField("rf"))
        grouped.select(col("l_orderkey"),
          concat(lit("{"),
            array_join(transform(array_sort(array_distinct(keys)),
              k => concat(lit("\""), k, lit("\":"), size(filter(keys, x => x === k)))), ","),
            lit("}")))
      }
    }
    best.foreach { case (k, v) => println(f"LAB $k $v%.3f") }
    spark.stop()
  }
}
