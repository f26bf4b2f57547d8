package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level A/B profiler for dd31's shingle pipeline at canary scale
  * (round-11): the r11 "shuffle diet" (hash-pair keys + min≠max) measured
  * 119 s at 100× where the r10 shape (string keys + countDistinct)
  * measured 47.7 s — the OPPOSITE of the diet's prediction, and identical
  * for md5 vs xxhash keys, so the regression is structural, not the hash
  * function. This main times the two shapes end-to-end AND their stages
  * (duplicate-set aggregate alone; hits join; coverage distinct) on the
  * same derived dataset so the winner is picked by measurement.
  *
  * Run: `runMain graft.Dd31Profile [factor]` (default 100).
  */
object Dd31Profile {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", if (factor >= 100) "256" else "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = ScaleCanary.derived(spark, factor)

    // fixture comes from DocPipeline's shared helper — the A/B shapes
    // below are historical ALTERNATE formulations profiled on the SAME
    // corpus/tokenization the committed query (shape C) uses
    def tok: DataFrame = graft.queries.DocPipeline.dd31Tok(spark, dir)

    // shape A (r10): string shingle key, countDistinct>1 dup test
    def shA: DataFrame = tok.select(col("doc_id"), explode(transform(
      sequence(lit(1), size(col("arr")) - 7),
      i => struct(i.as("s"),
        array_join(slice(col("arr"), i, lit(8)), " ").as("g")))).as("p"))
      .select(col("doc_id"), col("p.s").as("s"), col("p.g").as("g"))
    def dupA: DataFrame = shA.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select(col("g"))
    def hitsA: DataFrame = shA.join(dupA, Seq("g")).select(col("doc_id"), col("s"))

    // shape B (r11): (xxhash64, hash) pair key, min!=max dup test
    def shB: DataFrame = tok.select(col("doc_id"), explode(transform(
      sequence(lit(1), size(col("arr")) - 7),
      i => struct(i.as("s"),
        array_join(slice(col("arr"), i, lit(8)), " ").as("gs")))).as("p"))
      .select(col("doc_id"), col("p.s").as("s"),
        xxhash64(col("p.gs")).as("g1"), hash(col("p.gs")).as("g2"))
    def dupB: DataFrame = shB.groupBy(col("g1"), col("g2"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("g1"), col("g2"))
    def hitsB: DataFrame = shB.join(dupB, Seq("g1", "g2")).select(col("doc_id"), col("s"))

    def full(hits: DataFrame): DataFrame = {
      val coveredCnt = hits
        .select(col("doc_id"), explode(sequence(col("s"), col("s") + 7)).as("pos"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cov"))
      val hitCnt = hits.groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      tok.select(col("doc_id"), size(col("arr")).cast("long").as("n_tokens"))
        .join(coveredCnt, Seq("doc_id"), "left")
        .join(hitCnt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_hit"), lit(0L)).as("n_dup_shingles"),
          coalesce(col("n_cov"), lit(0L)).as("covered_tokens"),
          round(coalesce(col("n_cov"), lit(0L)).cast("double") / col("n_tokens"), 6)
            .as("dup_fraction"))
    }

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      System.err.println(f"[dd31prof] $label%-28s $dt%8.2f s")
      dt
    }

    // stage probes first (cheapest diagnosis), then full pipelines;
    // shape C = the committed query (hash-pair dup + island-merge coverage)
    val byName = SparkEntry.all.map(q => q.name -> q.run).toMap
    def fullC: DataFrame = byName("dd31_substring_dedup")(spark, dir)
    time("C: full (warm)")(fullC)
    val cFull = (1 to 2).map(i => time(s"C: full island #$i")(fullC)).min
    val aFull = (1 to 2).map(i => time(s"A: full r10 #$i")(full(hitsA))).min
    val bFull = (1 to 2).map(i => time(s"B: full explode #$i")(full(hitsB))).min
    println(f"DD31PROF factor=$factor A_full=$aFull%.2f B_full=$bFull%.2f C_full=$cFull%.2f")
    spark.stop()
  }
}
