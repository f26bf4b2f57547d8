package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}

/** Plan-audit helper.
  * `runMain graft.Explain [sfDir] [name ...]` — formatted physical plan
  * for the named queries (or all).
  * `runMain graft.Explain --summary [sfDir]` — one markdown table row per
  * query: exchange / broadcast / scan / pushed-filter counts from the
  * FINAL adaptive plan (each query is executed first — AQE hides the
  * exchanges until then), the shuffle-discipline inventory behind
  * PLANS.md.
  */
object Explain {

  /** Expand the executed plan through AQE wrappers, query stages, and
    * exchange reuse so counts reflect what actually ran. Shared with
    * PlanAssertionSpec's tree-walking pins. */
  private[graft] def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: children.flatMap(flatten)
  }

  def main(args: Array[String]): Unit = {
    val summary = args.contains("--summary")
    val rest = args.filterNot(_ == "--summary")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = rest.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked = SparkEntry.all.filter(q => names.isEmpty || names.contains(q.name))
    if (summary) {
      println("| query | shuffles | single-part | broadcasts | scans | pushed-filter scans |")
      println("|---|---|---|---|---|---|")
      picked.foreach { q =>
        val df = q.run(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val nodes = flatten(df.queryExecution.executedPlan)
        val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
        val single = shuffles.count(_.outputPartitioning.numPartitions == 1)
        val bcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
        val fileScans = nodes.collect { case f: FileSourceScanExec => f }
        val scans = fileScans.length + nodes.count(_.isInstanceOf[RDDScanExec])
        val pushed = fileScans.count(
          _.metadata.get("PushedFilters").exists(v => v != "[]"))
        println(s"| ${q.name} | ${shuffles.length - single} | $single | " +
          s"$bcasts | $scans | $pushed |")
      }
    } else {
      picked.foreach { q =>
        println(s"===== ${q.name} =====")
        println(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
