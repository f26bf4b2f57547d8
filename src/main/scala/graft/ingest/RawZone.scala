package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-zone ingestion (SURVEY.md §2.1 S1/S4/S5 + §1.3 schema evolution).
  * The reference's REST fetcher lands JSON per chunk; the engine-side
  * contract is: read the landed drops permissively (corrupt records
  * quarantined, never dropped), and evolve the stored schema by unioning
  * incoming fields with name-based type inference
  * (`etl-crimes/etl_crimes.py:292-341`).
  */
object RawZone {

  val CorruptCol = "_corrupt_record"

  /** S1 landing reader: permissive JSON with a quarantine column. */
  def readJsonDrops(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    val withSchema = schema match {
      case Some(s0) =>
        val s = if (s0.fieldNames.contains(CorruptCol)) s0
        else s0.add(StructField(CorruptCol, StringType))
        base.schema(s)
      case None => base
    }
    withSchema.json(path)
  }

  /** S5 reference-data reader: header CSV with type inference. */
  def readCsvDim(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** §1.3 name-based type inference, mirroring the reference's
    * `add_column_to_table` rule table: date-ish names → timestamp,
    * id/code names → short string, everything else → string. */
  def inferTypeFromName(name: String): DataType = {
    val n = name.toLowerCase
    if (n.contains("date") || n.endsWith("_at") || n.endsWith("_time")) TimestampType
    else if (n.endsWith("_id") || n.endsWith("_code") || n == "id") StringType
    else StringType
  }

  /** §1.3 schema evolution: union of the stored schema with incoming
    * fields. Existing columns keep their stored type; new columns get the
    * incoming type if concrete, else the name-inferred type. */
  def evolveSchema(stored: StructType, incoming: StructType): StructType = {
    val existing = stored.fieldNames.toSet
    val added = incoming.fields.filterNot(f => existing.contains(f.name)).map { f =>
      val dt = f.dataType match {
        case NullType => inferTypeFromName(f.name)
        case other => other
      }
      StructField(f.name, dt, nullable = true)
    }
    StructType(stored.fields ++ added)
  }

  /** Align a frame to an evolved schema: add missing columns as typed
    * NULLs, order columns canonically — the dynamic column-intersection
    * upsert shape (`etl-persons/etl_persons.py:1056`). */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    val withAll = target.fields.foldLeft(df) { (acc, f) =>
      if (present.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withAll.select(target.fieldNames.map(col).toSeq: _*)
  }

  /** S1 fetch shim: retry with exponential backoff (2^attempt), treating
    * not-found as empty — the reference's per-chunk fetch policy
    * (`etl-crimes/etl_crimes.py:381-450`: retries, 404→[], status=false→[]).
    * Pure control-flow (the sleeper is injectable for tests); the actual
    * HTTP transport stays outside the engine.
    */
  def fetchWithRetry[A](
      maxAttempts: Int = 3,
      baseDelayMs: Long = 100,
      sleep: Long => Unit = Thread.sleep)(
      fetch: () => A): Either[Throwable, A] = {
    @annotation.tailrec
    def loop(attempt: Int): Either[Throwable, A] =
      scala.util.Try(fetch()) match {
        case scala.util.Success(a) => Right(a)
        case scala.util.Failure(e) if attempt >= maxAttempts => Left(e)
        case scala.util.Failure(_) =>
          sleep(baseDelayMs * (1L << (attempt - 1)))   // 2^attempt backoff
          loop(attempt + 1)
      }
    loop(1)
  }

  /** Split a SQL script on statement-terminating semicolons only: a ';'
    * inside a single-quoted literal does not end a statement. The ''
    * escape toggles the quote state twice, which round-trips correctly. */
  private[ingest] def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    script.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** S11: run a multi-statement SQL script (view refresh driver,
    * `etl_refresh_views/views_refresh_sql.py`). Statements split on
    * quote-aware ';' boundaries, validated read-only by QueryGuard,
    * executed in order; returns the last result. */
  def runScript(spark: SparkSession, dir: String, script: String): Either[graft.ql.QueryGuard.Denied, DataFrame] = {
    val statements = splitStatements(script)
    statements.foldLeft(Right(spark.emptyDataFrame): Either[graft.ql.QueryGuard.Denied, DataFrame]) {
      case (Left(d), _) => Left(d)
      case (Right(_), stmt) => graft.ql.QueryGuard.execute(spark, dir, stmt, maxRows = 10000)
    }
  }
}
