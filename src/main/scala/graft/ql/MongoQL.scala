package graft.ql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Document-store (Mongo-style) query surface over the gold tables: a
  * validated `find(filter, projection)` and a validated aggregation
  * pipeline, compiled to Catalyst `Column` trees instead of being sent to
  * a document store.
  *
  * Mirrors the reference's second query surface
  * (`chatbot/security/query_validator.py:114-126,300-445` — dangerous
  * operators $where/$function/$eval/$accumulator and stages $out/$merge
  * blocked anywhere, max nesting depth 10, max 20 pipeline stages — and
  * `chatbot/database/mongo_executor.py:56-145` — read-only find/aggregate
  * with a hard row cap appended to every query). This closes the one
  * reference surface the rebuild's QL layer didn't cover.
  *
  * Deliberately STRICTER than the reference: the reference blocklists the
  * known-bad operators and lets everything else through to the store; a
  * compiler has to understand every operator it runs, so unknown
  * operators/stages/fields are denials, not passthroughs. Filters compile
  * with null-SAFE equality (`<=>`): Mongo's {f: v} never matches a
  * missing value and {$ne: v} does — SQL ternary null logic would
  * silently drop those rows instead.
  *
  * Scale shape: a find is filter+project+limit — predicate and projection
  * push to the scan. A pipeline is match→unwind→lookup→group→sort→limit —
  * the sort is always bounded by the appended row cap, so the terminal
  * plan is TakeOrdered, never a global sort; $lookup pre-aggregates the
  * foreign side to one row per key before its equi-join.
  */
object MongoQL {

  final case class Denied(code: String, detail: String)

  private val mapper = new ObjectMapper()

  /** The reference's blocklist (query_validator.py:122-126) — denied with
    * the dedicated code so the truth table distinguishes policy from
    * ignorance. */
  private val DangerousOps = Set("$where", "$function", "$eval", "$accumulator")
  private val DangerousStages = Set("$out", "$merge", "$where", "$function", "$accumulator")

  private val CmpOps =
    Set("$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists", "$regex", "$not")
  private val BoolOps = Set("$and", "$or", "$nor")
  private val GroupAccs = Set("$sum", "$avg", "$min", "$max", "$count")
  private val KnownStages =
    Set("$match", "$project", "$group", "$sort", "$limit", "$unwind", "$lookup",
      "$addFields", "$set", "$count", "$skip", "$sortByCount", "$bucket", "$replaceRoot")

  val MaxDepth = 10      // query_validator.py: "Query too complex (max depth: 10)"
  val MaxStages = 20     // query_validator.py: "Pipeline too long (max 20 stages)"
  val MaxRegexLen = 200  // compiler-side ReDoS bound (no analogue needed in the ref: the store caps execution time)
  val DefaultMaxRows = 1000 // mongo_executor.py Config.MAX_QUERY_ROWS analogue

  // ---- parsing / structural validation ------------------------------------

  private def parse(json: String): Either[Denied, JsonNode] =
    try {
      val n = mapper.readTree(json)
      if (n == null) Left(Denied("parse_error", "empty input")) else Right(n)
    } catch {
      case e: Exception => Left(Denied("parse_error", "invalid JSON"))
    }

  private def depthOf(n: JsonNode, d: Int): Int =
    if (n.isObject)
      n.properties().asScala.foldLeft(d)((m, e) => math.max(m, depthOf(e.getValue, d + 1)))
    else if (n.isArray)
      n.elements().asScala.foldLeft(d)((m, e) => math.max(m, depthOf(e, d + 1)))
    else d

  private def firstDangerous(n: JsonNode, bad: Set[String]): Option[String] =
    if (n.isObject)
      n.properties().asScala.collectFirst {
        case e if bad.contains(e.getKey) => e.getKey
      }.orElse(n.properties().asScala.flatMap(e => firstDangerous(e.getValue, bad)).headOption)
    else if (n.isArray)
      n.elements().asScala.flatMap(e => firstDangerous(e, bad)).nextOption()
    else None

  // ---- filter compiler -----------------------------------------------------

  private def toLit(v: JsonNode): Either[Denied, Column] =
    if (v.isTextual) Right(lit(v.asText))
    else if (v.isIntegralNumber) Right(lit(v.asLong))
    else if (v.isNumber) Right(lit(v.asDouble))
    else if (v.isBoolean) Right(lit(v.asBoolean))
    else if (v.isNull) Right(lit(null))
    else Left(Denied("bad_literal", v.getNodeType.toString))

  private def seqEither[A](xs: Seq[Either[Denied, A]]): Either[Denied, Seq[A]] =
    xs.foldRight(Right(Nil): Either[Denied, List[A]]) { (e, acc) =>
      for (a <- e; rest <- acc) yield a :: rest
    }

  /** Compile one field's operator object, e.g. {"$gte": 5, "$lt": 9}.
    * An EMPTY operator object (`{"f": {}}`, `{"$not": {}}`) is a denial,
    * not a crash: the validator must be total over untrusted JSON.
    * `$options` (Mongo's regex-flag sibling) is pre-extracted: it must
    * accompany a `$regex` in the same object and carry only the flags
    * Spark's rlike understands as inline modifiers (i/m/s/x). */
  private def compileOps(field: String, spec: JsonNode, cols: Set[String]): Either[Denied, Column] = {
    if (!spec.properties().iterator().hasNext)
      return Left(Denied("bad_operand", field))
    val optNode = Option(spec.get("$options"))
    val regexFlags: Either[Denied, String] = optNode match {
      case None => Right("")
      case Some(v) if !v.isTextual => Left(Denied("bad_operand", "$options"))
      case Some(_) if spec.get("$regex") == null =>
        Left(Denied("bad_operand", "$options without $regex"))
      case Some(v) if !v.asText.forall("imsx".contains(_)) =>
        Left(Denied("bad_operand", s"$$options flags must be in [imsx]: ${v.asText}"))
      case Some(v) => Right(if (v.asText.isEmpty) "" else s"(?${v.asText})")
    }
    if (regexFlags.isLeft) return Left(regexFlags.swap.toOption.get)
    val flags = regexFlags.toOption.get
    val c = col(field)
    val parts = spec.properties().asScala.toSeq
      .filter(_.getKey != "$options").map { e =>
      (e.getKey, e.getValue) match {
        case ("$eq", v)  => toLit(v).map(c <=> _)
        case ("$ne", v)  => toLit(v).map(l => !(c <=> l))
        case ("$gt", v)  => toLit(v).map(c > _)
        case ("$gte", v) => toLit(v).map(c >= _)
        case ("$lt", v)  => toLit(v).map(c < _)
        case ("$lte", v) => toLit(v).map(c <= _)
        case ("$in", v) if v.isArray =>
          // Mongo: a null element makes $in ALSO match missing/null fields
          // (and $nin exclude them). isin's ternary null logic would drop
          // those rows silently — compile the null element as isNull.
          val (nullEls, nonNull) = v.elements().asScala.toSeq.partition(_.isNull)
          seqEither(nonNull.map(toLit)).map { ls =>
            val base = if (ls.isEmpty) lit(false) else coalesce(c.isin(ls: _*), lit(false))
            if (nullEls.nonEmpty) base || c.isNull else base
          }
        case ("$nin", v) if v.isArray =>
          val (nullEls, nonNull) = v.elements().asScala.toSeq.partition(_.isNull)
          seqEither(nonNull.map(toLit)).map { ls =>
            val base = if (ls.isEmpty) lit(false) else coalesce(c.isin(ls: _*), lit(false))
            !(if (nullEls.nonEmpty) base || c.isNull else base)
          }
        case ("$exists", v) if v.isBoolean =>
          Right(if (v.asBoolean) c.isNotNull else c.isNull)
        case ("$regex", v) if v.isTextual =>
          if (v.asText.length > MaxRegexLen)
            Left(Denied("regex_too_long", s"max $MaxRegexLen chars"))
          else Right(c.rlike(flags + v.asText))
        case ("$not", v) if v.isObject =>
          compileOps(field, v, cols).map(inner => !coalesce(inner, lit(false)))
        case (op, _) if DangerousOps.contains(op) => Left(Denied("dangerous_operator", op))
        case (op, _) if CmpOps.contains(op) => Left(Denied("bad_operand", op))
        case (op, _) => Left(Denied("unknown_operator", op))
      }
    }
    seqEither(parts).map(_.reduce(_ && _))
  }

  /** Compile a full filter object (implicit AND over entries). */
  private def compileFilter(n: JsonNode, cols: Set[String]): Either[Denied, Column] = {
    if (!n.isObject) return Left(Denied("not_object", "filter must be a JSON object"))
    val entries = n.properties().asScala.toSeq
    if (entries.isEmpty) return Right(lit(true))
    val parts = entries.map { e =>
      (e.getKey, e.getValue) match {
        case (op, v) if BoolOps.contains(op) =>
          if (!v.isArray || !v.elements().hasNext)
            Left(Denied("bad_operand", s"$op needs a non-empty array"))
          else
            seqEither(v.elements().asScala.toSeq.map(compileFilter(_, cols))).map { cs =>
              op match {
                case "$and" => cs.reduce(_ && _)
                case "$or"  => cs.reduce(_ || _)
                case "$nor" => !coalesce(cs.reduce(_ || _), lit(false))
              }
            }
        case (op, _) if DangerousOps.contains(op) => Left(Denied("dangerous_operator", op))
        case (op, _) if op.startsWith("$") => Left(Denied("unknown_operator", op))
        case (f, _) if !cols.contains(f) => Left(Denied("unknown_field", f))
        case (f, v) if v.isObject && v.properties().asScala.forall(_.getKey.startsWith("$")) =>
          compileOps(f, v, cols)
        case (f, v) => toLit(v).map(l => if (v.isNull) col(f).isNull else col(f) <=> l)
      }
    }
    seqEither(parts).map(_.reduce(_ && _))
  }

  // ---- find ---------------------------------------------------------------

  /** Projection compiler: Mongo include-form ({f: 1/true}) and
    * exclude-form ({f: 0/false}); mixed forms are a denial (Mongo itself
    * rejects mixing outside _id), as is any other value — silently
    * treating {f: 0} as an INCLUDE would invert the user's intent. */
  private def compileProjection(proj: JsonNode, cols: Seq[String]): Either[Denied, Seq[String]] = {
    val entries = proj.properties().asScala.toSeq
    def flagOf(v: JsonNode): Option[Boolean] =
      if (v.isBoolean) Some(v.asBoolean)
      else if (v.isIntegralNumber && v.asLong == 1L) Some(true)
      else if (v.isIntegralNumber && v.asLong == 0L) Some(false)
      else None
    entries.find(e => !cols.contains(e.getKey)) match {
      case Some(e) => Left(Denied("unknown_field", e.getKey))
      case None =>
        val flags = entries.map(e => e.getKey -> flagOf(e.getValue))
        flags.find(_._2.isEmpty) match {
          case Some((f, _)) => Left(Denied("bad_projection", f))
          case None =>
            val (inc, exc) = flags.map { case (f, b) => (f, b.get) }.partition(_._2)
            if (inc.nonEmpty && exc.nonEmpty) Left(Denied("bad_projection", "mixed include/exclude"))
            else if (inc.nonEmpty) Right(inc.map(_._1))
            else if (exc.nonEmpty) { val drop = exc.map(_._1).toSet; Right(cols.filterNot(drop)) }
            else Right(Seq.empty)
        }
    }
  }

  /** Validated find over a loaded collection DataFrame. Projection accepts
    * Mongo include-form {field: 1} and exclude-form {field: 0}; empty →
    * all columns. */
  def find(df: DataFrame, filterJson: String, projectionJson: String = "{}",
           maxRows: Int = DefaultMaxRows): Either[Denied, DataFrame] =
    for {
      filter <- parse(filterJson)
      _ <- firstDangerous(filter, DangerousOps)
        .map(op => Left(Denied("dangerous_operator", op))).getOrElse(Right(()))
      _ <- if (depthOf(filter, 0) > MaxDepth) Left(Denied("too_deep", s"max depth $MaxDepth"))
           else Right(())
      cond <- compileFilter(filter, df.columns.toSet)
      proj <- parse(projectionJson)
      fields <- compileProjection(proj, df.columns.toSeq)
    } yield {
      val filtered = df.filter(cond)
      val projected = if (fields.isEmpty) filtered else filtered.select(fields.map(col): _*)
      projected.limit(maxRows)
    }

  // ---- scalar expression compiler ($addFields / $bucket groupBy) -----------

  /** Mongo aggregation-expression subset, compiled to Catalyst scalar
    * trees: "$field" refs, JSON literals, and the arithmetic/string
    * operators a projection stage actually uses. Everything else —
    * including every accumulator and the dangerous operators — is a
    * denial: a compiler only runs what it understands. Arithmetic is
    * ROW-WISE double math (bit-identical across engines, unlike
    * fold-order-dependent aggregates), so no rounding discipline is
    * needed beyond what the query itself requests via $round. */
  private def compileExpr(n: JsonNode, cols: Set[String]): Either[Denied, Column] =
    if (n.isTextual && n.asText.startsWith("$")) {
      val f = n.asText.drop(1)
      if (cols.contains(f)) Right(col(f)) else Left(Denied("unknown_field", f))
    } else if (!n.isObject) toLit(n)
    else {
      val entries = n.properties().asScala.toSeq
      if (entries.size != 1)
        return Left(Denied("bad_expression", "expression object needs exactly one operator"))
      val (op, v) = (entries.head.getKey, entries.head.getValue)
      def args(min: Int, max: Int): Either[Denied, Seq[Column]] =
        if (!v.isArray) Left(Denied("bad_operand", s"$op needs an argument array"))
        else {
          val xs = v.elements().asScala.toSeq
          if (xs.size < min || xs.size > max) Left(Denied("bad_operand", s"$op arity"))
          else seqEither(xs.map(compileExpr(_, cols)))
        }
      op match {
        case "$add"      => args(2, 64).map(_.reduce(_ + _))
        case "$multiply" => args(2, 64).map(_.reduce(_ * _))
        case "$subtract" => args(2, 2).map { case Seq(a, b) => a - b }
        case "$divide"   => args(2, 2).map { case Seq(a, b) => a / b }
        case "$concat"   => args(1, 64).map(cs => concat(cs: _*))
        case "$ifNull"   => args(2, 2).map { case Seq(a, b) => coalesce(a, b) }
        case "$toUpper"  => compileExpr(v, cols).map(upper)
        case "$toLower"  => compileExpr(v, cols).map(lower)
        case "$round" =>
          // [expr, places] with places an integral literal — $round with a
          // computed scale has no Catalyst equivalent (round's scale is a
          // foldable), so the stricter compiler pins it to a literal
          if (!v.isArray || v.size() != 2 || !v.get(1).isIntegralNumber)
            Left(Denied("bad_operand", "$round needs [expr, integer-literal places]"))
          else compileExpr(v.get(0), cols).map(round(_, v.get(1).asInt))
        case op if DangerousOps.contains(op) => Left(Denied("dangerous_operator", op))
        case op => Left(Denied("unknown_operator", op))
      }
    }

  // ---- aggregation pipeline ------------------------------------------------

  private def groupExpr(alias: String, spec: JsonNode): Either[Denied, Column] = {
    val entries = spec.properties().asScala.toSeq
    if (entries.size != 1) return Left(Denied("bad_accumulator", alias))
    val (op, v) = (entries.head.getKey, entries.head.getValue)
    op match {
      case "$sum" if v.isTextual && v.asText.startsWith("$") =>
        Right(sum(col(v.asText.drop(1))).as(alias))
      // only {$sum: 1} is count(*); any other numeric literal would be
      // value*count in Mongo — deny rather than silently miscount
      case "$sum" if v.isIntegralNumber && v.asLong == 1L => Right(count(lit(1)).as(alias))
      case "$sum" if v.isNumber => Left(Denied("bad_operand", "$sum literal must be 1"))
      // $avg as explicit sum/count: over integral-valued measures both
      // engines fold the exact same double, where a native avg may
      // accumulate in a different order
      case "$avg" if v.isTextual && v.asText.startsWith("$") =>
        val f = col(v.asText.drop(1)); Right((sum(f) / count(f)).as(alias))
      case "$min" if v.isTextual && v.asText.startsWith("$") =>
        Right(min(col(v.asText.drop(1))).as(alias))
      case "$max" if v.isTextual && v.asText.startsWith("$") =>
        Right(max(col(v.asText.drop(1))).as(alias))
      case "$count" => Right(count(lit(1)).as(alias))
      case op if DangerousOps.contains(op) => Left(Denied("dangerous_operator", op))
      case op if GroupAccs.contains(op) => Left(Denied("bad_operand", op))
      case op => Left(Denied("unknown_operator", op))
    }
  }

  /** $unwind: string form ("$arr") or object form ({path, optional
    * preserveNullAndEmptyArrays}); the path must name an ARRAY column —
    * compiled to explode / explode_outer in place. Unknown object keys are
    * denials (includeArrayIndex is not supported). */
  private def applyUnwind(df: DataFrame, body: JsonNode): Either[Denied, DataFrame] = {
    val pathEither: Either[Denied, (String, Boolean)] =
      if (body.isTextual) Right((body.asText, false))
      else if (body.isObject) {
        val keys = body.properties().asScala.map(_.getKey).toSet
        if (!keys.subsetOf(Set("path", "preserveNullAndEmptyArrays")))
          Left(Denied("bad_stage", s"$$unwind unknown option: ${(keys -- Set("path", "preserveNullAndEmptyArrays")).head}"))
        else Option(body.get("path")).filter(_.isTextual) match {
          case None => Left(Denied("bad_stage", "$unwind needs a path"))
          case Some(p) =>
            val pres = Option(body.get("preserveNullAndEmptyArrays"))
            if (pres.exists(!_.isBoolean)) Left(Denied("bad_operand", "preserveNullAndEmptyArrays"))
            else Right((p.asText, pres.exists(_.asBoolean)))
        }
      } else Left(Denied("bad_stage", "$unwind body must be a path string or object"))
    pathEither.flatMap { case (path, preserve) =>
      if (!path.startsWith("$")) Left(Denied("bad_stage", "$unwind path must be a $field ref"))
      else {
        val f = path.drop(1)
        if (!df.columns.contains(f)) Left(Denied("unknown_field", f))
        else if (!df.schema(f).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
          Left(Denied("bad_stage", s"$$unwind field is not an array: $f"))
        else Right(df.withColumn(f, if (preserve) explode_outer(col(f)) else explode(col(f))))
      }
    }
  }

  /** $lookup: {from, localField, foreignField, as} — compiled as a
    * null-safe left equi-join against the resolved collection with the
    * matches collected as a SORTED struct array (sort_array pins a
    * deterministic element order; Mongo's is insertion order, which a
    * distributed shuffle cannot reproduce). Scale shape: the foreign side
    * pre-aggregates to one row per key before the join, so the join input
    * is bounded by the foreign key cardinality and AQE may broadcast it. */
  private def applyLookup(df: DataFrame, body: JsonNode,
                          resolve: String => Either[Denied, DataFrame]): Either[Denied, DataFrame] = {
    if (!body.isObject) return Left(Denied("bad_stage", "$lookup body must be an object"))
    val keys = body.properties().asScala.map(_.getKey).toSet
    val required = Set("from", "localField", "foreignField", "as")
    if (keys != required)
      return Left(Denied("bad_stage",
        s"$$lookup needs exactly {from, localField, foreignField, as}"))
    def str(k: String): Either[Denied, String] = {
      val n = body.get(k)
      if (n.isTextual && n.asText.nonEmpty) Right(n.asText)
      else Left(Denied("bad_operand", s"$$lookup $k must be a string"))
    }
    for {
      from <- str("from")
      localField <- str("localField")
      foreignField <- str("foreignField")
      asName <- str("as")
      _ <- if (!df.columns.contains(localField)) Left(Denied("unknown_field", localField))
           else Right(())
      _ <- if (df.columns.contains(asName))
             Left(Denied("bad_stage", s"$$lookup as-field collides with an existing column: $asName"))
           else Right(())
      foreign <- resolve(from)
      _ <- if (!foreign.columns.contains(foreignField)) Left(Denied("unknown_field", foreignField))
           else Right(())
    } yield {
      val kName = "__graft_lookup_key"
      val fCols = foreign.columns.toSeq
      val grouped = foreign
        .groupBy(col(foreignField).as(kName))
        .agg(sort_array(collect_list(struct(fCols.map(col): _*))).as(asName))
      val joined = df.join(grouped, col(localField) <=> col(kName), "left").drop(kName)
      // Mongo yields [] (not null) when nothing matches; array() is
      // array<null>, cast to the joined element type
      val arrType = joined.schema(asName).dataType
      joined.withColumn(asName, coalesce(col(asName), array().cast(arrType)))
    }
  }

  private def applyStage(df: DataFrame, stage: JsonNode, cols: Set[String],
                         resolve: String => Either[Denied, DataFrame]): Either[Denied, DataFrame] = {
    val entries = stage.properties().asScala.toSeq
    if (entries.size != 1) return Left(Denied("bad_stage", "stage must have exactly one key"))
    val (name, body) = (entries.head.getKey, entries.head.getValue)
    name match {
      case s if DangerousStages.contains(s) => Left(Denied("dangerous_stage", s))
      case s if !KnownStages.contains(s) => Left(Denied("unknown_stage", s))
      case "$unwind" => applyUnwind(df, body)
      case "$lookup" => applyLookup(df, body, resolve)
      case "$match" => compileFilter(body, df.columns.toSet).map(df.filter)
      case "$project" =>
        val fs = body.properties().asScala.toSeq.map(_.getKey)
        fs.find(f => !df.columns.contains(f)) match {
          case Some(f) => Left(Denied("unknown_field", f))
          case None if fs.isEmpty => Left(Denied("bad_stage", "$project needs fields"))
          case None => Right(df.select(fs.map(col): _*))
        }
      case "$group" =>
        val idNode = Option(body.get("_id")).getOrElse(
          return Left(Denied("bad_stage", "$group needs _id")))
        val idCol: Either[Denied, Column] =
          if (idNode.isNull) Right(lit(null).cast("string").as("_id"))
          else if (idNode.isTextual && idNode.asText.startsWith("$")) {
            val f = idNode.asText.drop(1)
            if (df.columns.contains(f)) Right(col(f).as("_id"))
            else Left(Denied("unknown_field", f))
          } else Left(Denied("bad_stage", "_id must be null or a $field ref"))
        val accs = body.properties().asScala.toSeq.filter(_.getKey != "_id")
          .map(e => groupExpr(e.getKey, e.getValue))
        for {
          id <- idCol
          as <- seqEither(accs)
          _ <- if (as.isEmpty) Left(Denied("bad_stage", "$group needs accumulators")) else Right(())
        } yield df.groupBy(id).agg(as.head, as.tail: _*)
      case "$sort" =>
        val keys = body.properties().asScala.toSeq.map { e =>
          val v = e.getValue
          if (!df.columns.contains(e.getKey)) Left(Denied("unknown_field", e.getKey))
          // Mongo direction is ±1 only; "desc"/1.5/etc. silently becoming
          // ascending would invert user intent — deny instead
          else if (!v.isIntegralNumber || math.abs(v.asLong) != 1L)
            Left(Denied("bad_operand", s"$$sort direction must be 1 or -1: ${e.getKey}"))
          else Right(if (v.asLong < 0) col(e.getKey).desc else col(e.getKey).asc)
        }
        seqEither(keys).flatMap { ks =>
          if (ks.isEmpty) Left(Denied("bad_stage", "$sort needs keys"))
          else Right(df.orderBy(ks: _*))
        }
      case "$limit" =>
        // bound above by Int.MaxValue too: asInt would truncate 2^31 to a
        // negative, escaping the Either contract with an analysis exception
        if (body.isIntegralNumber && body.asLong > 0 && body.asLong <= Int.MaxValue)
          Right(df.limit(body.asInt))
        else Left(Denied("bad_stage", "$limit needs a positive 32-bit integer"))
      case "$skip" =>
        // compiled to Dataset.offset — order-dependent exactly like Mongo's
        // $skip, so a deterministic pipeline pairs it with a $sort on a key
        if (body.isIntegralNumber && body.asLong >= 0 && body.asLong <= Int.MaxValue)
          Right(df.offset(body.asInt))
        else Left(Denied("bad_stage", "$skip needs a non-negative 32-bit integer"))
      case "$count" =>
        // {$count: "name"} → one row {name: n}; a $-prefixed or empty name
        // is a denial (Mongo rejects both at parse time)
        if (body.isTextual && body.asText.nonEmpty && !body.asText.startsWith("$"))
          Right(df.agg(count(lit(1)).as(body.asText)))
        else Left(Denied("bad_stage", "$count needs a non-empty, non-$ field name"))
      case "$addFields" | "$set" =>
        // every expression resolves against the stage INPUT (Mongo
        // semantics: same-stage fields are not visible to each other), so
        // all columns are added in one withColumns call, not a fold
        if (!body.isObject || !body.properties().iterator().hasNext)
          Left(Denied("bad_stage", s"$name needs at least one field"))
        else {
          val entries = body.properties().asScala.toSeq
          entries.find(_.getKey.startsWith("$")) match {
            case Some(e) => Left(Denied("bad_stage", s"field name cannot start with $$: ${e.getKey}"))
            case None =>
              seqEither(entries.map(e =>
                compileExpr(e.getValue, df.columns.toSet).map(e.getKey -> _)))
                .map(cs => df.withColumns(cs.toMap))
          }
        }
      case "$sortByCount" =>
        if (body.isTextual && body.asText.startsWith("$")) {
          val f = body.asText.drop(1)
          if (!df.columns.contains(f)) Left(Denied("unknown_field", f))
          else Right(df.groupBy(col(f).as("_id")).agg(count(lit(1)).as("count"))
            .orderBy(col("count").desc))
        } else Left(Denied("bad_stage", "$sortByCount needs a $field ref"))
      case "$bucket" => applyBucket(df, body)
      case "$replaceRoot" =>
        // {newRoot: "$structField"} → promote the struct's fields and drop
        // everything else; the field-ref-only form (no computed documents)
        // is the shape $lookup+$unwind produces, which is what the stage
        // exists for in a read-only pipeline
        val newRoot = if (body.isObject) Option(body.get("newRoot")) else None
        newRoot match {
          case Some(p) if p.isTextual && p.asText.startsWith("$") =>
            val f = p.asText.drop(1)
            if (!df.columns.contains(f)) Left(Denied("unknown_field", f))
            else if (!df.schema(f).dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
              Left(Denied("bad_stage", s"$$replaceRoot field is not a document: $f"))
            else Right(df.select(col(s"$f.*")))
          case _ => Left(Denied("bad_stage", "$replaceRoot needs {newRoot: \"$field\"}"))
        }
    }
  }

  /** $bucket: {groupBy, boundaries, default, output?} — a static CASE over
    * strictly-increasing INTEGRAL boundaries. Stricter than Mongo in two
    * documented ways: `default` is REQUIRED (an out-of-range row is a
    * per-row runtime error in Mongo, which a compiled plan cannot raise —
    * requiring the default keeps the compiler total), and the emitted
    * `_id` is a STRING (the lower boundary rendered in decimal, or the
    * default label) because one Catalyst column cannot mix Mongo's
    * numeric-bucket/string-default types. Scale shape: one partial-
    * aggregated groupBy over a codegen'd CASE — no join, no sort. */
  private def applyBucket(df: DataFrame, body: JsonNode): Either[Denied, DataFrame] = {
    if (!body.isObject) return Left(Denied("bad_stage", "$bucket body must be an object"))
    val keys = body.properties().asScala.map(_.getKey).toSet
    if (!keys.subsetOf(Set("groupBy", "boundaries", "default", "output")))
      return Left(Denied("bad_stage",
        s"$$bucket unknown option: ${(keys -- Set("groupBy", "boundaries", "default", "output")).head}"))
    if (!keys.contains("groupBy") || !keys.contains("boundaries") || !keys.contains("default"))
      return Left(Denied("bad_stage", "$bucket needs {groupBy, boundaries, default}"))
    val bNode = body.get("boundaries")
    val bounds: Either[Denied, Seq[Long]] =
      if (!bNode.isArray || bNode.size() < 2)
        Left(Denied("bad_stage", "$bucket boundaries need >= 2 values"))
      else {
        val xs = bNode.elements().asScala.toSeq
        if (!xs.forall(_.isIntegralNumber))
          Left(Denied("bad_stage", "$bucket boundaries must be integer literals"))
        else {
          val ls = xs.map(_.asLong)
          if (ls.sliding(2).forall(p => p.head < p.last)) Right(ls)
          else Left(Denied("bad_stage", "$bucket boundaries must be strictly increasing"))
        }
      }
    val defNode = body.get("default")
    for {
      bs <- bounds
      dflt <- if (defNode.isTextual && defNode.asText.nonEmpty) Right(defNode.asText)
              else Left(Denied("bad_stage", "$bucket default must be a non-empty string label"))
      _ <- if (bs.map(_.toString).contains(dflt))
             Left(Denied("bad_stage", "$bucket default collides with a boundary label"))
           else Right(())
      gb <- compileExpr(body.get("groupBy"), df.columns.toSet)
      accs <- Option(body.get("output")) match {
        case None => Right(Seq(count(lit(1)).as("count")))
        case Some(o) if o.isObject && o.properties().iterator().hasNext =>
          seqEither(o.properties().asScala.toSeq.map(e => groupExpr(e.getKey, e.getValue)))
        case Some(_) => Left(Denied("bad_stage", "$bucket output must be a non-empty object"))
      }
    } yield {
      val idCol = bs.sliding(2).toSeq.foldLeft(lit(dflt)) { case (acc, Seq(lo, hi)) =>
        when(gb >= lit(lo) && gb < lit(hi), lit(lo.toString)).otherwise(acc)
      }.as("_id")
      df.groupBy(idCol).agg(accs.head, accs.tail: _*)
    }
  }

  /** Validated aggregation pipeline:
    * [$match|$project|$group|$sort|$limit|$skip|$count|$addFields|$set|
    * $sortByCount|$bucket|$replaceRoot|$unwind|$lookup]. `resolve`
    * loads a $lookup collection; the default denies every name, so
    * $lookup is only live through [[aggregateCollection]] (or an explicit
    * resolver), mirroring the executor's fixed db handle. */
  def aggregate(df: DataFrame, pipelineJson: String,
                maxRows: Int = DefaultMaxRows,
                resolve: String => Either[Denied, DataFrame] =
                  n => Left(Denied("unknown_collection", n))): Either[Denied, DataFrame] =
    for {
      p <- parse(pipelineJson)
      _ <- if (!p.isArray) Left(Denied("not_array", "pipeline must be a JSON array")) else Right(())
      stages = p.elements().asScala.toSeq
      _ <- if (stages.length > MaxStages) Left(Denied("pipeline_too_long", s"max $MaxStages stages"))
           else Right(())
      _ <- firstDangerous(p, DangerousOps)
        .map(op => Left(Denied("dangerous_operator", op))).getOrElse(Right(()))
      _ <- if (depthOf(p, 0) > MaxDepth) Left(Denied("too_deep", s"max depth $MaxDepth"))
           else Right(())
      out <- stages.foldLeft(Right(df): Either[Denied, DataFrame]) { (acc, st) =>
        acc.flatMap { d =>
          if (!st.isObject) Left(Denied("bad_stage", "stage must be an object"))
          else applyStage(d, st, d.columns.toSet, resolve)
        }
      }
    } yield out.limit(maxRows)

  private def tableResolver(s: SparkSession, dir: String): String => Either[Denied, DataFrame] =
    name =>
      if (!graft.core.Tables.all.contains(name)) Left(Denied("unknown_collection", name))
      else Right(graft.core.Tables(s, dir, name))

  /** find() against a named collection via the Tables loader; unknown
    * collections are a denial, mirroring the executor's fixed db handle. */
  def findCollection(s: SparkSession, dir: String, collection: String,
                     filterJson: String, projectionJson: String = "{}",
                     maxRows: Int = DefaultMaxRows): Either[Denied, DataFrame] =
    if (!graft.core.Tables.all.contains(collection))
      Left(Denied("unknown_collection", collection))
    else find(graft.core.Tables(s, dir, collection), filterJson, projectionJson, maxRows)

  /** aggregate() against a named collection, with $lookup resolving other
    * gold tables through the same loader. */
  def aggregateCollection(s: SparkSession, dir: String, collection: String,
                          pipelineJson: String,
                          maxRows: Int = DefaultMaxRows): Either[Denied, DataFrame] =
    if (!graft.core.Tables.all.contains(collection))
      Left(Denied("unknown_collection", collection))
    else aggregate(graft.core.Tables(s, dir, collection), pipelineJson, maxRows,
      tableResolver(s, dir))
}
