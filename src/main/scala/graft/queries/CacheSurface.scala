package graft.queries

import graft.QueryDef
import graft.ql.{QueryGuard, ResultCache}

/** Driver-visible gate for the QL result cache (ql/ResultCache — the
  * reference's Redis query cache rebuilt in-JVM; see the class doc). The
  * truth table exercises a REAL cache against the guarded executor with a
  * manual clock, so hit/miss accounting, TTL expiry, LRU eviction,
  * denial passthrough, and version-shift keying are all hash-gated. */
object CacheSurface {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "qlc_cache_truth",
      "Result-cache truth table (the reference's Redis query cache as an in-JVM LRU): first run misses, an identical statement hits and returns the SAME collected rows, advancing the injected clock past the TTL re-misses, a capacity-1 cache evicts LRU, denials pass through WITHOUT being cached, and a data-version change shifts every key (file-fingerprint versioning — stricter than the reference's schema-only hash, which serves stale rows after a same-schema reload)",
      Some("""
        SELECT * FROM (VALUES
          ('denial_not_cached', 'denied_uncached'),
          ('first_run',         'miss'),
          ('lru_evicted',       'miss'),
          ('repeat_run',        'hit_equal'),
          ('ttl_expired',       'miss'),
          ('version_shift',     'shifted')
        ) AS t(case_name, outcome)
      """)) { (s, dir) =>
      import s.implicits._
      var tick = 0L
      val cache = new ResultCache(capacity = 8, ttlMillis = 1000L, clock = () => tick)
      val q1 = "SELECT count(*) AS n FROM nation"
      def rowsOf(e: Either[QueryGuard.Denied, QueryGuard.RunResult]) =
        e.fold(d => throw new IllegalStateException(d.toString), _.rows.toSeq)

      val r1 = rowsOf(cache.getOrRun(s, dir, q1))
      val firstRun = if (cache.misses == 1 && cache.hits == 0) "miss" else "unexpected"

      val r2 = rowsOf(cache.getOrRun(s, dir, q1))
      val repeatRun =
        if (cache.hits == 1 && r2 == r1) "hit_equal" else "unexpected"

      tick += 2000L // past the 1000ms TTL
      rowsOf(cache.getOrRun(s, dir, q1))
      val ttlExpired = if (cache.misses == 2) "miss" else "unexpected"

      val tiny = new ResultCache(capacity = 1, ttlMillis = 1000000L, clock = () => 0L)
      rowsOf(tiny.getOrRun(s, dir, q1))
      rowsOf(tiny.getOrRun(s, dir, "SELECT count(*) AS n FROM region"))
      rowsOf(tiny.getOrRun(s, dir, q1)) // q1 was evicted by the region query
      val lruEvicted = if (tiny.misses == 3 && tiny.hits == 0) "miss" else "unexpected"

      val sizeBefore = cache.size
      val denied = cache.getOrRun(s, dir, "DROP TABLE nation").isLeft
      val denialNotCached =
        if (denied && cache.size == sizeBefore) "denied_uncached" else "unexpected"

      val versionShift =
        if (cache.key(q1, "v1") != cache.key(q1, "v2")) "shifted" else "unexpected"

      Seq(
        ("denial_not_cached", denialNotCached),
        ("first_run", firstRun),
        ("lru_evicted", lruEvicted),
        ("repeat_run", repeatRun),
        ("ttl_expired", ttlExpired),
        ("version_shift", versionShift)
      ).toDF("case_name", "outcome")
    }
  )
}
