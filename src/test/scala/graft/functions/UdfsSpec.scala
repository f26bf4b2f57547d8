package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UdfsSpec extends SparkTestBase {
  import spark.implicits._

  test("uuid_v5 matches the RFC 4122 reference vector") {
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, 'example.com')
    assert(Udfs.uuidV5(Udfs.NamespaceDns, "example.com") ==
      "cfbff0d1-9375-5685-968c-48ce8b15ae17")
    assert(Udfs.uuidV5(Udfs.NamespaceDns, "example.com") ==
      Udfs.uuidV5(Udfs.NamespaceDns, "example.com"))
  }

  test("trigram similarity: identity = 1, disjoint = 0, known partial") {
    assert(Udfs.trigramSimilarity("word", "word") == 1.0)
    assert(Udfs.trigramSimilarity("abc", "xyz") == 0.0)
    // pg_trgm: similarity('word','words') = 0.57142854 (4 shared of 7)
    assert(math.abs(Udfs.trigramSimilarity("word", "words") - 4.0 / 7.0) < 1e-9)
    assert(Udfs.trigramSimilarity(null, "x") == 0.0)
  }

  test("ratcliff-obershelp matches difflib.SequenceMatcher.ratio") {
    // python: SequenceMatcher(None, 'abcd', 'bcde').ratio() == 0.75
    assert(Udfs.ratcliffObershelp("abcd", "bcde") == 0.75)
    assert(Udfs.ratcliffObershelp("same", "same") == 1.0)
    assert(Udfs.ratcliffObershelp("", "") == 0.0)
  }

  test("transliteration is deterministic and covers the char map") {
    assert(Udfs.transliterate("कखग") == "kkhg")
    assert(Udfs.transliterate("plain") == "plain")
    assert(Udfs.transliterate(null) == null)
  }

  test("soundex built-in produces classic codes (T13 exact values)") {
    val out = Seq("Robert", "Rupert", "Ashcraft", "Tymczak")
      .toDF("name").select(soundex(col("name"))).as[String].collect()
    assert(out.toSeq == Seq("R163", "R163", "A261", "T522"))
  }

  test("UDFs work through the SQL registration path") {
    Udfs.register(spark)
    val r = spark.sql(
      "SELECT uuid_v5('example.com') AS u, trigram_sim('word','words') AS t").collect().head
    assert(r.getString(0) == "cfbff0d1-9375-5685-968c-48ce8b15ae17")
    assert(math.abs(r.getDouble(1) - 4.0 / 7.0) < 1e-9)
  }
}
