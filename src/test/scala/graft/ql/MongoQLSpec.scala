package graft.ql

import graft.SparkTestBase

/** First-principles checks for the Mongo-style surface beyond the
  * driver-gated truth table: operator semantics on constructed rows
  * (null-safe $ne/$nin, $exists, $not), boundary behavior of the depth
  * and stage caps (exactly-at-limit allowed), row-cap enforcement, and
  * pipeline composition order.
  */
class MongoQLSpec extends SparkTestBase {

  private def df = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, Some("en"), Some(10L)),
      (2L, Some("fr"), None),
      (3L, None, Some(30L)),
      (4L, Some("en"), Some(40L))
    ).toDF("id", "lang", "n")
  }

  private def ids(e: Either[MongoQL.Denied, org.apache.spark.sql.DataFrame]): Set[Long] =
    e.fold(d => fail(s"denied: $d"), _.select("id").collect().map(_.getLong(0)).toSet)

  test("$ne and $nin match missing values (null-safe document semantics)") {
    assert(ids(MongoQL.find(df, """{"lang": {"$ne": "en"}}""")) == Set(2L, 3L))
    assert(ids(MongoQL.find(df, """{"lang": {"$nin": ["en", "fr"]}}""")) == Set(3L))
  }

  test("$exists true/false split the null rows") {
    assert(ids(MongoQL.find(df, """{"n": {"$exists": false}}""")) == Set(2L))
    assert(ids(MongoQL.find(df, """{"n": {"$exists": true}}""")) == Set(1L, 3L, 4L))
  }

  test("$not negates with missing-matches semantics") {
    // NOT(n >= 30): rows 1 (10) and 2 (missing n) match, 3/4 do not
    assert(ids(MongoQL.find(df, """{"n": {"$not": {"$gte": 30}}}""")) == Set(1L, 2L))
  }

  test("range + equality conjunction and $or composition") {
    assert(ids(MongoQL.find(df, """{"lang": "en", "n": {"$gte": 20, "$lte": 40}}""")) == Set(4L))
    assert(ids(MongoQL.find(df,
      """{"$or": [{"lang": "fr"}, {"n": {"$gt": 35}}]}""")) == Set(2L, 4L))
  }

  test("depth cap: exactly at the limit allowed, one past denied") {
    def nest(k: Int) = (1 to k).foldLeft("""{"$eq": 1}""")((j, _) => s"""{"$$not": $j}""")
    // {"n": nest(8)} has nesting depth 10 → allowed
    assert(MongoQL.find(df, s"""{"n": ${nest(8)}}""").isRight)
    assert(MongoQL.find(df, s"""{"n": ${nest(9)}}""")
      .swap.exists(_.code == "too_deep"))
  }

  test("row cap is enforced on find") {
    val got = MongoQL.find(df, "{}", maxRows = 2).fold(d => fail(d.toString), identity)
    assert(got.count() == 2)
  }

  test("pipeline: match→group→sort composes; 20 stages allowed, 21 denied") {
    val out = MongoQL.aggregate(df,
      """[{"$match": {"n": {"$exists": true}}},
          {"$group": {"_id": "$lang", "total": {"$sum": "$n"}, "k": {"$sum": 1}}},
          {"$sort": {"_id": 1}}]""")
      .fold(d => fail(d.toString), identity).collect()
    val byId = out.map(r => Option(r.getString(0)).getOrElse("NULL") ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(byId("en") == (50L, 2L) && byId("NULL") == (30L, 1L))
    val m = """{"$match": {"lang": "en"}}"""
    assert(MongoQL.aggregate(df, "[" + Seq.fill(20)(m).mkString(",") + "]").isRight)
    assert(MongoQL.aggregate(df, "[" + Seq.fill(21)(m).mkString(",") + "]")
      .swap.exists(_.code == "pipeline_too_long"))
  }

  test("projection prunes columns; unknown projection field denied") {
    val got = MongoQL.find(df, "{}", """{"id": 1, "lang": 1}""")
      .fold(d => fail(d.toString), identity)
    assert(got.columns.toSeq == Seq("id", "lang"))
    assert(MongoQL.find(df, "{}", """{"nope": 1}""").swap.exists(_.code == "unknown_field"))
  }

  test("dangerous operators denied wherever they nest; unknown ops denied") {
    assert(MongoQL.find(df, """{"$where": "1"}""").swap.exists(_.code == "dangerous_operator"))
    assert(MongoQL.find(df, """{"$or": [{"id": 1}, {"n": {"$function": "f"}}]}""")
      .swap.exists(_.code == "dangerous_operator"))
    assert(MongoQL.find(df, """{"n": {"$mod": [2, 0]}}""")
      .swap.exists(_.code == "unknown_operator"))
    assert(MongoQL.aggregate(df, """[{"$out": "x"}]""").swap.exists(_.code == "dangerous_stage"))
  }
}
