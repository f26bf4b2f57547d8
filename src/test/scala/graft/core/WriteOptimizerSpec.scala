package graft.core

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WriteOptimizerSpec extends SparkTestBase {

  private def partFiles(dir: String): Array[File] =
    new File(dir).listFiles((f: File) =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("tiny input collapses to a single file") {
    val out = Files.createTempDirectory("wo-one").toString
    val df = Tables(spark, sf0001, "region")
    val n = WriteOptimizer.sizedWrite(df, out)
    assert(n == 1)
    assert(partFiles(out).length == 1)
    assert(sameRows(spark.read.parquet(out), df))
  }

  test("small targetBytes fans out to the estimated file count") {
    val out = Files.createTempDirectory("wo-fan").toString
    val df = Tables(spark, sf0001, "lineitem")
    val want = WriteOptimizer.targetPartitions(df, targetBytes = 64 * 1024)
    assert(want > 1, s"expected a multi-file estimate, got $want")
    val n = WriteOptimizer.sizedWrite(df, out, targetBytes = 64 * 1024)
    assert(n == want)
    assert(partFiles(out).length == want)
    assert(sameRows(spark.read.parquet(out), df))
  }

  test("estimate reflects column pruning: a projection sizes smaller than the scan") {
    val df = Tables(spark, sf0001, "lineitem")
    val full = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val narrow = df.select("l_orderkey", "l_quantity")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(narrow < full, s"narrow=$narrow full=$full")
  }

  test("maxParts caps the fan-out") {
    val df = Tables(spark, sf0001, "lineitem")
    assert(WriteOptimizer.targetPartitions(df, targetBytes = 1, maxParts = 7) == 7)
  }

  test("sortCols yields files whose rows are sorted (row-group pruning ready)") {
    val out = Files.createTempDirectory("wo-sort").toString
    WriteOptimizer.sizedWrite(
      Tables(spark, sf0001, "orders"), out,
      targetBytes = 256 * 1024, sortCols = Seq("o_orderdate"))
    val files = partFiles(out)
    assert(files.nonEmpty)
    files.foreach { f =>
      val dates = spark.read.parquet(f.getPath)
        .select(col("o_orderdate").cast("string")).collect().map(_.getString(0))
      assert(dates.sameElements(dates.sorted), s"unsorted file ${f.getName}")
    }
  }

  test("partitioned write bounds files per directory at maxFilesPerPart") {
    val out = Files.createTempDirectory("wo-hive").toString
    val df = Tables(spark, sf0001, "orders")
      .withColumn("part_status", col("o_orderstatus"))
      // spread rows across many input partitions so an unbounded write
      // would emit one file per (task, value) pair
      .repartition(8)
    WriteOptimizer.sizedPartitionedWrite(df, out, "part_status", maxFilesPerPart = 2)
    val dirs = new File(out).listFiles((f: File) => f.getName.startsWith("part_status="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = partFiles(d.getPath)
      assert(files.length <= 2, s"${d.getName} has ${files.length} files")
    }
    assert(sameRows(
      spark.read.parquet(out).select(df.columns.head, df.columns.tail: _*),
      df))
  }
}
