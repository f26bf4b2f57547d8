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

  test("$in/$nin with a null element match/exclude missing fields (Mongo null semantics)") {
    // Mongo: a null element in $in ALSO matches docs whose field is
    // missing; $nin with null excludes them — isin's ternary logic would
    // silently drop the null rows from both
    assert(ids(MongoQL.find(df, """{"lang": {"$in": ["fr", null]}}""")) == Set(2L, 3L))
    assert(ids(MongoQL.find(df, """{"lang": {"$nin": ["fr", null]}}""")) == Set(1L, 4L))
    // empty lists: $in matches nothing, $nin everything
    assert(ids(MongoQL.find(df, """{"lang": {"$in": []}}""")) == Set())
    assert(ids(MongoQL.find(df, """{"lang": {"$nin": []}}""")) == Set(1L, 2L, 3L, 4L))
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

  test("$regex honors $options flags; malformed $options denied") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq((1L, "Alpha"), (2L, "alpha"), (3L, "beta")).toDF("id", "s")
    def got(filter: String) = MongoQL.find(d, filter)
      .fold(x => fail(x.toString), _.select("id").collect().map(_.getLong(0)).toSet)
    assert(got("""{"s": {"$regex": "alpha"}}""") == Set(2L))
    assert(got("""{"s": {"$regex": "alpha", "$options": "i"}}""") == Set(1L, 2L))
    assert(MongoQL.find(d, """{"s": {"$options": "i"}}""")
      .swap.exists(_.code == "bad_operand")) // $options without $regex
    assert(MongoQL.find(d, """{"s": {"$regex": "a", "$options": "g"}}""")
      .swap.exists(_.code == "bad_operand")) // unknown flag
    assert(MongoQL.find(d, """{"s": {"$regex": "a", "$options": 1}}""")
      .swap.exists(_.code == "bad_operand")) // non-string
  }

  test("empty operator objects are denials, not crashes") {
    assert(MongoQL.find(df, """{"n": {}}""").swap.exists(_.code == "bad_operand"))
    assert(MongoQL.find(df, """{"n": {"$not": {}}}""").swap.exists(_.code == "bad_operand"))
  }

  test("projection exclude-form drops fields; mixed and non-flag values denied") {
    val got = MongoQL.find(df, "{}", """{"lang": 0}""").fold(d => fail(d.toString), identity)
    assert(got.columns.toSeq == Seq("id", "n"))
    assert(MongoQL.find(df, "{}", """{"id": 1, "lang": 0}""")
      .swap.exists(_.code == "bad_projection"))
    assert(MongoQL.find(df, "{}", """{"id": "yes"}""")
      .swap.exists(_.code == "bad_projection"))
  }

  test("$sort non-±1 direction, $sum literal != 1, and $limit overflow are denials") {
    assert(MongoQL.aggregate(df, """[{"$sort": {"lang": "desc"}}]""")
      .swap.exists(_.code == "bad_operand"))
    assert(MongoQL.aggregate(df, """[{"$sort": {"lang": 2}}]""")
      .swap.exists(_.code == "bad_operand"))
    assert(MongoQL.aggregate(df, """[{"$sort": {"lang": -1}}]""").isRight)
    assert(MongoQL.aggregate(df, """[{"$group": {"_id": "$lang", "n": {"$sum": 2}}}]""")
      .swap.exists(_.code == "bad_operand"))
    assert(MongoQL.aggregate(df, """[{"$limit": 2147483648}]""")
      .swap.exists(_.code == "bad_stage"))
    assert(MongoQL.aggregate(df, """[{"$limit": 2}]""").isRight)
  }

  private def arrDf = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, Seq("a", "b"), 10L),
      (2L, Seq.empty[String], 20L),
      (3L, null.asInstanceOf[Seq[String]], 20L)
    ).toDF("id", "tags", "k")
  }

  test("$unwind explodes arrays; preserveNullAndEmptyArrays keeps empty/null rows") {
    val plain = MongoQL.aggregate(arrDf, """[{"$unwind": "$tags"}]""")
      .fold(d => fail(d.toString), identity).collect()
    assert(plain.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (1L, "b")))
    val kept = MongoQL.aggregate(arrDf,
      """[{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": true}}]""")
      .fold(d => fail(d.toString), identity).collect()
    assert(kept.map(_.getLong(0)).sorted.toSeq == Seq(1L, 1L, 2L, 3L))
    // malformed forms
    assert(MongoQL.aggregate(arrDf, """[{"$unwind": "$k"}]""")
      .swap.exists(_.code == "bad_stage")) // not an array
    assert(MongoQL.aggregate(arrDf, """[{"$unwind": "$nope"}]""")
      .swap.exists(_.code == "unknown_field"))
    assert(MongoQL.aggregate(arrDf, """[{"$unwind": "tags"}]""")
      .swap.exists(_.code == "bad_stage")) // missing $ prefix
    assert(MongoQL.aggregate(arrDf,
      """[{"$unwind": {"path": "$tags", "includeArrayIndex": "i"}}]""")
      .swap.exists(_.code == "bad_stage")) // unsupported option
  }

  test("$lookup left-joins with empty-array (not null) on no match; malformed bodies denied") {
    val spark2 = spark
    import spark2.implicits._
    val right = Seq((10L, "x"), (10L, "y"), (40L, "z")).toDF("rk", "v")
    val resolver: String => Either[MongoQL.Denied, org.apache.spark.sql.DataFrame] = {
      case "right" => Right(right)
      case other => Left(MongoQL.Denied("unknown_collection", other))
    }
    val out = MongoQL.aggregate(df,
      """[{"$lookup": {"from": "right", "localField": "n",
                       "foreignField": "rk", "as": "matches"}}]""",
      resolve = resolver)
      .fold(d => fail(d.toString), identity)
    val sizes = out.select(org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("matches")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // id=1 (n=10) matches two rows; id=4 (n=40) one; id=2 (n missing) and
    // id=3 (n=30) match nothing → EMPTY array, size 0 not -1/null
    assert(sizes == Map(1L -> 2, 2L -> 0, 3L -> 0, 4L -> 1))
    assert(MongoQL.aggregate(df,
      """[{"$lookup": {"from": "right", "localField": "n", "foreignField": "rk"}}]""",
      resolve = resolver).swap.exists(_.code == "bad_stage")) // missing as
    assert(MongoQL.aggregate(df,
      """[{"$lookup": {"from": "right", "localField": "n",
                       "foreignField": "rk", "as": "lang"}}]""",
      resolve = resolver).swap.exists(_.code == "bad_stage")) // as collides
    assert(MongoQL.aggregate(df,
      """[{"$lookup": {"from": "nope", "localField": "n",
                       "foreignField": "rk", "as": "m"}}]""",
      resolve = resolver).swap.exists(_.code == "unknown_collection"))
  }

  test("dangerous operators denied wherever they nest; unknown ops denied") {
    assert(MongoQL.find(df, """{"$where": "1"}""").swap.exists(_.code == "dangerous_operator"))
    assert(MongoQL.find(df, """{"$or": [{"id": 1}, {"n": {"$function": "f"}}]}""")
      .swap.exists(_.code == "dangerous_operator"))
    assert(MongoQL.find(df, """{"n": {"$mod": [2, 0]}}""")
      .swap.exists(_.code == "unknown_operator"))
    assert(MongoQL.aggregate(df, """[{"$out": "x"}]""").swap.exists(_.code == "dangerous_stage"))
  }

  test("$addFields computes against the stage INPUT (same-stage isolation) and can overwrite") {
    val out = MongoQL.aggregate(df,
      """[{"$addFields": {"n2": {"$add": ["$n", 1]},
                          "n": {"$multiply": ["$n", 10]}}},
          {"$match": {"id": 1}}]""")
      .fold(d => fail(d.toString), identity).collect().head
    // n2 = old n + 1 (NOT the overwritten n*10 + 1), n overwritten to 100
    assert(out.getAs[Long]("n2") == 11L && out.getAs[Long]("n") == 100L)
    // $set is an alias
    assert(MongoQL.aggregate(df, """[{"$set": {"k": "x"}}]""").isRight)
    // null propagation through arithmetic: id=2 has missing n
    val nulls = MongoQL.aggregate(df,
      """[{"$addFields": {"m": {"$ifNull": [{"$add": ["$n", 5]}, -1]}}},
          {"$match": {"id": 2}}]""")
      .fold(d => fail(d.toString), identity).collect().head
    assert(nulls.getAs[Long]("m") == -1L)
  }

  test("$count, $skip, $sortByCount compose deterministically under a key sort") {
    val n = MongoQL.aggregate(df, """[{"$match": {"lang": "en"}}, {"$count": "n"}]""")
      .fold(d => fail(d.toString), identity).collect().head.getLong(0)
    assert(n == 2L)
    val page = MongoQL.aggregate(df,
      """[{"$sort": {"id": 1}}, {"$skip": 2}, {"$limit": 1}]""")
      .fold(d => fail(d.toString), identity).collect().map(_.getLong(0)).toSeq
    assert(page == Seq(3L))
    assert(MongoQL.aggregate(df, """[{"$skip": 0}]""").isRight)
    val sbc = MongoQL.aggregate(df, """[{"$sortByCount": "$lang"}]""")
      .fold(d => fail(d.toString), identity).collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> r.getLong(1)).toMap
    assert(sbc == Map("en" -> 2L, "fr" -> 1L, "∅" -> 1L))
  }

  test("$bucket buckets on [lo, hi) with required default; malformed forms denied") {
    val out = MongoQL.aggregate(df,
      """[{"$bucket": {"groupBy": "$n", "boundaries": [0, 20, 40],
                       "default": "other",
                       "output": {"c": {"$sum": 1}, "mx": {"$max": "$n"}}}}]""")
      .fold(d => fail(d.toString), identity).collect()
      .map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    // n=10 → [0,20); n=30 → [20,40); n=40 and missing-n → default
    assert(out("0") == ((1L, Some(10L))) && out("20") == ((1L, Some(30L))))
    assert(out("other")._1 == 2L)
    assert(MongoQL.aggregate(df,
      """[{"$bucket": {"groupBy": "$n", "boundaries": [5], "default": "o"}}]""")
      .swap.exists(_.code == "bad_stage")) // < 2 boundaries
    assert(MongoQL.aggregate(df,
      """[{"$bucket": {"groupBy": "$n", "boundaries": [0, 10.5], "default": "o"}}]""")
      .swap.exists(_.code == "bad_stage")) // non-integral boundary
    assert(MongoQL.aggregate(df,
      """[{"$bucket": {"groupBy": "$n", "boundaries": [0, 20], "default": "0"}}]""")
      .swap.exists(_.code == "bad_stage")) // default collides with a boundary label
    assert(MongoQL.aggregate(df,
      """[{"$bucket": {"groupBy": "$n", "boundaries": [0, 20], "default": "o",
                       "extra": 1}}]""")
      .swap.exists(_.code == "bad_stage")) // unknown option
  }

  test("$replaceRoot promotes a struct column; non-struct and computed forms denied") {
    val spark2 = spark
    import spark2.implicits._
    val right = Seq((10L, "x"), (40L, "z")).toDF("rk", "v")
    val resolver: String => Either[MongoQL.Denied, org.apache.spark.sql.DataFrame] = {
      case "right" => Right(right)
      case other => Left(MongoQL.Denied("unknown_collection", other))
    }
    val out = MongoQL.aggregate(df,
      """[{"$lookup": {"from": "right", "localField": "n",
                       "foreignField": "rk", "as": "m"}},
          {"$unwind": "$m"},
          {"$replaceRoot": {"newRoot": "$m"}}]""",
      resolve = resolver)
      .fold(d => fail(d.toString), identity)
    assert(out.columns.toSeq == Seq("rk", "v"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((10L, "x"), (40L, "z")))
    assert(MongoQL.aggregate(df, """[{"$replaceRoot": {"newRoot": "$lang"}}]""")
      .swap.exists(_.code == "bad_stage"))
    assert(MongoQL.aggregate(df, """[{"$replaceRoot": "$lang"}]""")
      .swap.exists(_.code == "bad_stage"))
  }

  test("expression compiler: string ops, arity, and unknown operators") {
    val out = MongoQL.aggregate(df,
      """[{"$match": {"id": 1}},
          {"$addFields": {"u": {"$toUpper": "$lang"},
                          "j": {"$concat": ["$lang", "-", {"$toUpper": "$lang"}]}}}]""")
      .fold(d => fail(d.toString), identity).collect().head
    assert(out.getAs[String]("u") == "EN" && out.getAs[String]("j") == "en-EN")
    assert(MongoQL.aggregate(df, """[{"$addFields": {"x": {"$divide": [1, 2, 3]}}}]""")
      .swap.exists(_.code == "bad_operand"))
    assert(MongoQL.aggregate(df, """[{"$addFields": {"x": {"$regexFind": "a"}}}]""")
      .swap.exists(_.code == "unknown_operator"))
    assert(MongoQL.aggregate(df, """[{"$addFields": {"x": {"$add": ["$nope", 1]}}}]""")
      .swap.exists(_.code == "unknown_field"))
  }
}
