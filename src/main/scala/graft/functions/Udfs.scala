package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** The short list of operators built-ins can't express (SURVEY.md §2.12):
  * RFC-4122 v5 UUIDs, pg_trgm-style trigram similarity,
  * Ratcliff/Obershelp ratio (difflib.SequenceMatcher equivalent), and the
  * Indic→Latin transliteration approximation. All pure and deterministic;
  * registered as named SQL functions for the ql surface.
  */
object Udfs {

  /** RFC 4122 §4.3 name-based v5 UUID (SHA-1).
    * Reference use: `uuid_generate_v5(ns, name)` for deterministic child
    * ids, `unified_brief_facts_etl.sql:74-75`. */
  def uuidV5(namespace: UUID, name: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    val nsBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(namespace.getMostSignificantBits)
      .putLong(namespace.getLeastSignificantBits).array()
    md.update(nsBytes)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val bb = java.nio.ByteBuffer.wrap(h, 0, 16)
    new UUID(bb.getLong, bb.getLong).toString
  }

  val NamespaceDns: UUID = UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

  /** pg_trgm-compatible similarity: 3-gram sets over the padded lowered
    * string ('  word ' padding, per Postgres), Jaccard of the two sets.
    * Reference thresholds (state .85 / district .80 / mandal .65) are
    * calibrated against these semantics, `update-state-country.py:9-39`. */
  def trigramSimilarity(a: String, b: String): Double = {
    // pg_trgm pads EACH word with 2 leading + 1 trailing space and unions
    // the per-word trigram sets; padding the whole phrase would emit a
    // spurious word-final "x  " trigram pg_trgm never produces. Words are
    // delimited by ANY non-alphanumeric run (pg_trgm's word extraction),
    // not just whitespace — "foo,bar" is two words.
    def grams(s: String): Set[String] =
      s.trim.toLowerCase.split("[^\\p{Alnum}]+").iterator.filter(_.nonEmpty).flatMap { w =>
        val padded = "  " + w + " "
        (0 to padded.length - 3).map(i => padded.substring(i, i + 3))
      }.toSet
    if (a == null || b == null) 0.0
    else {
      val (ga, gb) = (grams(a), grams(b))
      val union = (ga ++ gb).size
      if (union == 0) 0.0 else ga.intersect(gb).size.toDouble / union
    }
  }

  /** Ratcliff/Obershelp similarity ≅ difflib.SequenceMatcher.ratio
    * (without the junk heuristic): 2*M / (|a|+|b|) where M is total
    * matched chars over recursive longest-common-substring splits.
    * Reference use: dedup scoring, `create_person_deduplication_table.py:75`. */
  def ratcliffObershelp(a: String, b: String): Double = {
    def longestMatch(a: String, b: String): (Int, Int, Int) = {
      var best = (0, 0, 0)
      val n = b.length
      // classic O(|a|*|b|) DP on match lengths
      var prev = new Array[Int](n + 1)
      for (i <- 1 to a.length) {
        val cur = new Array[Int](n + 1)
        for (j <- 1 to n) {
          if (a.charAt(i - 1) == b.charAt(j - 1)) {
            cur(j) = prev(j - 1) + 1
            if (cur(j) > best._3) best = (i - cur(j), j - cur(j), cur(j))
          }
        }
        prev = cur
      }
      best
    }
    def matches(a: String, b: String): Int = {
      if (a.isEmpty || b.isEmpty) 0
      else {
        val (ia, ib, len) = longestMatch(a, b)
        if (len == 0) 0
        else len + matches(a.substring(0, ia), b.substring(0, ib)) +
          matches(a.substring(ia + len), b.substring(ib + len))
      }
    }
    if (a == null || b == null || a.length + b.length == 0) 0.0
    else 2.0 * matches(a, b) / (a.length + b.length)
  }

  /** Indic→Latin transliteration approximation (T12): deterministic
    * char-map, mirrors `brief_facts_ai/main.py:101-135`'s shape. */
  private val TranslitMap: Map[Char, String] = Map(
    'अ' -> "a", 'आ' -> "aa", 'इ' -> "i", 'ई' -> "ii", 'उ' -> "u",
    'ऊ' -> "uu", 'ए' -> "e", 'ओ' -> "o", 'क' -> "k", 'ख' -> "kh",
    'ग' -> "g", 'घ' -> "gh", 'च' -> "ch", 'ज' -> "j", 'ट' -> "t",
    'ड' -> "d", 'ण' -> "n", 'त' -> "t", 'थ' -> "th", 'द' -> "d",
    'ध' -> "dh", 'न' -> "n", 'प' -> "p", 'फ' -> "ph", 'ब' -> "b",
    'भ' -> "bh", 'म' -> "m", 'य' -> "y", 'र' -> "r", 'ल' -> "l",
    'व' -> "v", 'श' -> "sh", 'ष' -> "sh", 'स' -> "s", 'ह' -> "h",
    'ा' -> "a", 'ि' -> "i", 'ी' -> "i", 'ु' -> "u", 'ू' -> "u",
    'े' -> "e", 'ो' -> "o", '्' -> "")

  def transliterate(s: String): String =
    if (s == null) null
    else s.flatMap(c => TranslitMap.getOrElse(c, c.toString))

  // ---- Column wrappers + SQL registration --------------------------------

  val uuidV5Udf = udf((name: String) =>
    if (name == null) null else uuidV5(NamespaceDns, name))
  val trigramSimUdf = udf(trigramSimilarity _)
  val ratioUdf = udf(ratcliffObershelp _)
  val translitUdf = udf(transliterate _)

  def uuid_v5(c: Column): Column = uuidV5Udf(c)
  def trigram_sim(a: Column, b: Column): Column = trigramSimUdf(a, b)
  def ro_ratio(a: Column, b: Column): Column = ratioUdf(a, b)
  def translit(c: Column): Column = translitUdf(c)

  /** Register as SQL functions for the ql query surface — the UDF forms
    * plus the whole-stage-codegen native expressions. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("uuid_v5", (name: String) =>
      if (name == null) null else uuidV5(NamespaceDns, name))
    spark.udf.register("trigram_sim", trigramSimilarity _)
    spark.udf.register("ro_ratio", ratcliffObershelp _)
    spark.udf.register("translit", transliterate _)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("uuid_v5_native",
      children => NativeExpressions.UuidV5(children.head), "built-in")
    reg.createOrReplaceTempFunction("trigram_sim_native",
      {
        case Seq(a, b) => NativeExpressions.TrigramSimilarity(a, b)
        case other => throw new IllegalArgumentException(
          s"trigram_sim_native expects 2 arguments, got ${other.size}")
      }, "built-in")
  }
}
