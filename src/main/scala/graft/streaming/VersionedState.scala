package graft.streaming

/** Crash recovery for the parquet-versioned maintainers
  * (Gold/Funnel/Index/Drift): state directories are written as
  * `<prefix>_v<N>` with parquet's `_SUCCESS` marker, so the latest
  * COMMITTED version is discoverable from the filesystem alone — a
  * restarted maintainer resumes from it instead of losing its place
  * with the in-memory counter.
  *
  * A multi-table version (postings+index, fact+gold) is committed only
  * when EVERY table of that version has its marker: a crash between the
  * two writes leaves a torn version that recovery must skip.
  */
object VersionedState {

  /** Write `df` to `path` and return the read-back frame with the WRITE
    * schema pinned: `spark.read.parquet` without a schema launches a
    * footer-inference job per call, and the maintainers re-open their
    * state tables many times per batch — the replay gates paid 20-30
    * such driver-side jobs each (measured, OPTIMIZATION_r11.md). The
    * pinned schema is exactly what was just written, so inference would
    * discover the same thing. */
  def writeRead(df: org.apache.spark.sql.DataFrame, path: String,
      compact: Boolean = false): org.apache.spark.sql.DataFrame = {
    // compact=true: repartition small states to one file before writing.
    // A maintainer state is usually the tail of a UNION (spliced base +
    // delta) whose partition count is the SUM of its children's — no
    // exchange on top, so AQE never coalesces it and each version GAINS
    // files (measured 33 → 49 → 57 across three index batches; every
    // downstream state scan then a 30+-task stage over <1 MB). Size-gated
    // on the optimizer's estimate (conf spark.graft.state.compactBytes,
    // default one 128 MiB file): past the threshold the write is
    // untouched, so at production scale no state-sized shuffle is added.
    // OPT-IN because it serializes the write task: measured a win only
    // for states that are slim AND re-scanned several times per batch
    // (the index maintainer); the fat rendered-JSON gold state LOST more
    // on the single-task parquet encode than the reads saved
    // (st_gold/st_metrics +1.2 s, OPTIMIZATION_r11.md).
    val spark = df.sparkSession
    val sized = if (compact && {
      val threshold = spark.conf
        .get("spark.graft.state.compactBytes", (128L * 1024 * 1024).toString).toLong
      df.queryExecution.optimizedPlan.stats.sizeInBytes < threshold
    }) df.repartition(1) else df
    sized.write.mode("overwrite").parquet(path)
    spark.read.schema(df.schema).parquet(path)
  }

  /** Exact row count of a just-written parquet state table from its file
    * footers — metadata the write already produced, no Spark job. The
    * maintainers' metrics (state_rows/gold_rows per batch) are counts of
    * tables they wrote milliseconds earlier; a `df.count()` scan per
    * metric was two extra jobs per batch. */
  def rowCount(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map { f =>
      val rf = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try rf.getRecordCount finally rf.close()
    }.sum
  }

  private def versionsOf(workDir: String, prefix: String): Seq[Int] = {
    val base = new java.io.File(workDir)
    Option(base.list()).toSeq.flatten
      .filter(_.startsWith(prefix + "_v"))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix + "_v").toInt).toOption)
      .filter(v => new java.io.File(base, s"${prefix}_v$v/_SUCCESS").exists)
  }

  /** Highest version for which every named state table is fully written
    * (has its `_SUCCESS` marker). None when no complete version exists. */
  def latestCommitted(workDir: String, prefixes: Seq[String]): Option[Int] =
    prefixes
      .map(p => versionsOf(workDir, p).toSet)
      .reduceOption(_ intersect _)
      .flatMap(_.maxOption)

  /** Remove EVERY `<prefix>_v*` directory (committed or torn) under
    * workDir. Maintainers call this from init(): recover() takes the MAX
    * committed version, so a "fresh" init that only writes v0 over a
    * workDir holding higher versions from a prior run would silently
    * resurrect stale state on the next recovery. */
  def dropVersions(workDir: String, prefixes: String*): Unit = {
    val base = new java.io.File(workDir)
    for {
      name <- Option(base.list()).toSeq.flatten
      p <- prefixes
      if name.startsWith(p + "_v") &&
        name.stripPrefix(p + "_v").forall(_.isDigit)
    } deleteRec(new java.io.File(base, name))
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete(): Unit
  }
}
