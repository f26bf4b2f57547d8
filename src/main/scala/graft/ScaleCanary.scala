package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale canary: a MEASURED datapoint behind the 100×-scale plan claims.
  *
  * The shipped testdata tops out at sf0.1, so the canary derives a 10×
  * dataset from it — 10 key-offset replicas per table, FK relationships
  * preserved within each replica, dims (nation/region) fixed like TPC-H —
  * then times the heaviest inventory queries at both scales and reports
  * the ratio. Near-linear operators should land at ≈10× (±JVM noise and
  * the fixed per-query overhead, which at these sizes biases ratios
  * BELOW 10); anything super-linear is a scale bug the plan audit missed.
  *
  * Corpus realism: replica texts get a per-replica word tag, so each
  * replica owns its vocabulary slice. Without it, every doc would have 9
  * exact clones, and the dedup family's candidate sets would grow ~100×
  * by DATA pathology rather than engine behavior — the canary would
  * measure the synthetic duplication, not the scaling. Embeddings get a
  * small per-replica component shift for the same reason.
  *
  * Usage: `runMain graft.ScaleCanary [maxQueries]` — writes
  * SCALE_CANARY.json. The derived dataset is cached under
  * target/sf1-derived and reused if present.
  */
object ScaleCanary {

  private val Base = "/root/testdata/sf0.1"
  private val Derived = "target/sf1-derived"
  private val Replicas = 10

  /** Per-key-domain replica offsets (well above each domain's max key). */
  private val OrdOff = 10000000L
  private val CustOff = 1000000L
  private val SuppOff = 1000000L
  private val PartOff = 1000000L
  private val DocOff = 1000000L
  private val EvOff = 10000000L
  private val UserOff = 1000000L

  private def replicate(df: DataFrame, shifts: Map[String, Long],
      textTag: Boolean = false, embShift: Boolean = false): DataFrame =
    (0 until Replicas).map { r =>
      var d = df
      shifts.foreach { case (c, off) =>
        d = d.withColumn(c, (col(c) + lit(r * off)).cast(df.schema(c).dataType))
      }
      if (textTag && r > 0) {
        // per-replica vocabulary: tag every word so shingle/term keys do
        // not collide across replicas (see scaladoc)
        d = d.withColumn("text",
            array_join(transform(split(col("text"), " "),
              w => concat(lit(s"r$r"), w)), " "))
          .withColumn("n_chars", length(col("text")))
      }
      if (embShift && r > 0)
        d = d.withColumn("embedding",
          transform(col("embedding"), x => x + lit(r * 0.0137f)))
      d
    }.reduce(_ unionByName _)

  private def generate(spark: SparkSession): Unit = {
    def t(n: String) = spark.read.parquet(s"$Base/$n.parquet")
    def w(df: DataFrame, n: String) =
      df.write.mode("overwrite").parquet(s"$Derived/$n.parquet")
    w(t("region"), "region")
    w(t("nation"), "nation")
    w(replicate(t("customer"), Map("c_custkey" -> CustOff)), "customer")
    w(replicate(t("supplier"), Map("s_suppkey" -> SuppOff)), "supplier")
    w(replicate(t("part"), Map("p_partkey" -> PartOff)), "part")
    w(replicate(t("orders"),
      Map("o_orderkey" -> OrdOff, "o_custkey" -> CustOff)), "orders")
    w(replicate(t("lineitem"), Map("l_orderkey" -> OrdOff,
      "l_partkey" -> PartOff, "l_suppkey" -> SuppOff)), "lineitem")
    w(replicate(t("events"),
      Map("event_id" -> EvOff, "user_id" -> UserOff)), "events")
    w(replicate(t("documents"), Map("doc_id" -> DocOff), textTag = true),
      "documents")
    w(replicate(t("embeddings"), Map("vec_id" -> DocOff), embShift = true),
      "embeddings")
  }

  /** Top-N heaviest queries by the committed full-inventory bench. */
  private def heaviest(n: Int): Seq[String] = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_LOCAL.json")))
    val entry = "\"([A-Za-z0-9_]+)\":([0-9.]+)".r
    entry.findAllMatchIn(src)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter { case (k, _) => k != "total" && k != "value" }
      .toSeq.sortBy(-_._2).take(n).map(_._1)
  }

  def main(args: Array[String]): Unit = {
    val maxQ = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$Derived/embeddings.parquet/_SUCCESS").exists()) {
      System.err.println("[canary] generating 10x derived dataset…")
      generate(spark)
    }

    val names = heaviest(maxQ)
    val byName = SparkEntry.all.map(q => q.name -> q.run).toMap
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(dir: String, name: String): Double = {
      val fn = byName(name)
      // warmup once, then min of 3 — min-of-2 left cold-page-cache
      // outliers in the ratios (mv_accuseds read 21× on a run whose
      // min-of-3 is 7.8×); same interference rationale as Bench
      fn(spark, dir).write.format("noop").mode("overwrite").save(); cleanup()
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      }.min
    }

    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val rows = names.filter(byName.contains).flatMap { name =>
      try {
        val tb = time(Base, name)
        val td = time(Derived, name)
        System.err.println(f"[canary] $name base=$tb%.2f 10x=$td%.2f ratio=${td / tb}%.1f")
        Some(s""""$name":{"t_base":${fmt(tb)},"t_10x":${fmt(td)},"ratio":${fmt(td / tb)}}""")
      } catch { case e: Throwable =>
        System.err.println(s"[canary] $name FAILED: ${e.getMessage}"); None
      }
    }
    val json = s"""{"base":"$Base","factor":$Replicas,"queries":{${rows.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_CANARY.json"), json)
    spark.stop()
  }
}
