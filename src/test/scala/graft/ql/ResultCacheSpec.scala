package graft.ql

import graft.SparkTestBase

/** First-principles checks for the QL result cache beyond the
  * qlc_cache_truth gate: real data-version invalidation from a touched
  * file (the gate can only exercise key separation), hit/miss accounting
  * across distinct statements, and whitespace-insensitive keying.
  */
class ResultCacheSpec extends SparkTestBase {

  test("dataVersion shifts when any table file's mtime changes") {
    val tmp = java.nio.file.Files.createTempDirectory("rc-ver").toFile
    val src = new java.io.File(s"$sf0001/nation.parquet")
    val dst = new java.io.File(tmp, "nation.parquet")
    java.nio.file.Files.copy(src.toPath, dst.toPath)
    val v1 = ResultCache.dataVersion(tmp.getAbsolutePath)
    assert(dst.setLastModified(dst.lastModified() + 60000L))
    val v2 = ResultCache.dataVersion(tmp.getAbsolutePath)
    assert(v1 != v2)
    // absent tables participate too: the same dir without the file differs
    assert(dst.delete())
    assert(ResultCache.dataVersion(tmp.getAbsolutePath) != v2)
  }

  test("distinct statements get distinct entries; identical-after-trim statements share one") {
    var t = 0L
    val c = new ResultCache(capacity = 8, ttlMillis = 1000000L, clock = () => t)
    def run(sql: String) = c.getOrRun(spark, sf0001, sql).fold(
      d => fail(d.toString), identity)
    val a = run("SELECT count(*) AS n FROM nation")
    run("SELECT count(*) AS n FROM region")
    assert(c.misses == 2 && c.hits == 0 && c.size == 2)
    val b = run("  SELECT count(*) AS n FROM nation  ")
    assert(c.hits == 1 && c.size == 2)
    assert(a.rows.toSeq == b.rows.toSeq && a.columns.sameElements(b.columns))
  }

  test("versionOf memoizes the directory walk; a touched file still invalidates after the memo expires") {
    val tmp = java.nio.file.Files.createTempDirectory("rc-memo").toFile
    val src = new java.io.File(s"$sf0001/nation.parquet")
    val dst = new java.io.File(tmp, "nation.parquet")
    java.nio.file.Files.copy(src.toPath, dst.toPath)
    var t = 0L
    val c = new ResultCache(capacity = 8, ttlMillis = 1000000L, clock = () => t,
      versionTtlMillis = 1000L)
    val v1 = c.versionOf(tmp.getAbsolutePath)
    // touch a file INSIDE the memo window: the stale memo is served (one
    // walk per window is the whole point)
    assert(dst.setLastModified(dst.lastModified() + 60000L))
    t = 999L
    assert(c.versionOf(tmp.getAbsolutePath) == v1)
    // past the window the walk re-runs and sees the touch
    t = 1001L
    assert(c.versionOf(tmp.getAbsolutePath) != v1)
  }

  test("expired entries are replaced, not served") {
    var t = 0L
    val c = new ResultCache(capacity = 8, ttlMillis = 100L, clock = () => t)
    val sql = "SELECT count(*) AS n FROM supplier"
    c.getOrRun(spark, sf0001, sql)
    t = 99L
    c.getOrRun(spark, sf0001, sql)
    assert(c.hits == 1)
    t = 200L // entry written at t=0 is now expired
    c.getOrRun(spark, sf0001, sql)
    assert(c.misses == 2 && c.hits == 1)
  }
}
