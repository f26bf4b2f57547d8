package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented operator queries, keyed by SURVEY.md §2 operator id. */
  def all: Seq[QueryDef] =
    queries0

  private def queries0: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.MergeQueries.defs ++
      graft.queries.Nested.defs ++
      graft.queries.GoldMv.defs ++
      graft.queries.GoldMvFull.defs ++
      graft.queries.Resolve.defs ++
      graft.queries.Cascades.defs ++
      graft.queries.DocPipeline.defs ++
      graft.queries.TrainPrep.defs ++
      graft.queries.Dimensional.defs ++
      graft.queries.SearchRank.defs ++
      graft.queries.Association.defs ++
      graft.queries.AnnSearch.defs ++
      graft.queries.Conform.defs ++
      graft.queries.TextOps.defs ++
      graft.queries.LlmOps.defs ++
      graft.queries.Ingest.defs ++
      graft.queries.Surface.defs ++
      graft.queries.Extras.defs ++
      graft.queries.ScaleOps.defs ++
      graft.queries.OlapOps.defs ++
      graft.queries.SeriesOps.defs ++
      graft.queries.MixOps.defs ++
      graft.queries.QualityProbes.defs ++
      graft.queries.CurateOps.defs ++
      graft.queries.SelectOps.defs ++
      graft.queries.StatsOps.defs ++
      graft.queries.ValueOps.defs ++
      graft.queries.TrustOps.defs ++
      graft.queries.MongoSurface.defs ++
      graft.queries.CacheSurface.defs ++
      graft.queries.ChunkOps.defs ++
      graft.queries.CorpusOps.defs ++
      graft.queries.QlQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "j1_star_join_revenue").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
