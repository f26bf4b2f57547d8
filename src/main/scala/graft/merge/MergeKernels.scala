package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The five reusable sink/merge kernels every reference ETL terminates in
  * (SURVEY.md §2.1 S6–S10). All are pure DataFrame→DataFrame transforms:
  * the caller owns the write (partition-overwrite at scale).
  *
  * Scale notes (100 TB): every kernel is a single equi-join on the merge
  * key — shuffle-partitioned on that key, no driver involvement, no
  * cartesian. When `staged` is a small delta (the common incremental
  * case) Catalyst/AQE broadcasts it; the anti-join side of childReplace /
  * appendIfAbsent prunes with a distinct-key broadcast.
  */
object MergeKernels {

  private val SP = "__staged_present"
  private val TP = "__target_present"

  /** Null-safe join condition on the key columns. */
  private def keyCond(keys: Seq[String]): Column =
    keys.map(k => col(s"s.$k") <=> col(s"t.$k")).reduce(_ && _)

  /** S6 — change-detecting upsert with op classification.
    *
    * Reference: `etl-crimes/etl_crimes.py:673-777` — `INSERT ... ON
    * CONFLICT (pk) DO UPDATE SET ... WHERE <col> IS DISTINCT FROM
    * EXCLUDED.<col>`, classifying each staged record as
    * inserted/updated/no_change. Target-only rows are retained (`kept`).
    *
    * `IS DISTINCT FROM` ≡ `!(a <=> b)` (null-safe inequality).
    * Schemas of `target` and `staged` must match.
    */
  def upsertClassify(target: DataFrame, staged: DataFrame, pk: Seq[String]): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(pk.contains)
    val s = staged.withColumn(SP, lit(true)).alias("s")
    val t = target.withColumn(TP, lit(true)).alias("t")
    val joined = s.join(t, keyCond(pk), "full_outer")
    val sPresent = col(s"s.$SP") <=> lit(true)
    val tPresent = col(s"t.$TP") <=> lit(true)
    val changed = dataCols
      .map(c => !(col(s"s.$c") <=> col(s"t.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val keyOut = pk.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k))
    val valOut = dataCols.map(c => when(sPresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c))
    val op = when(!tPresent, "inserted")
      .when(!sPresent, "kept")
      .when(changed, "updated")
      .otherwise("no_change")
    joined.select(keyOut ++ valOut :+ op.as("op"): _*)
  }

  /** S7 — null-preserving "smart merge".
    *
    * Reference: `etl-accused/etl_accused.py:1316-1392` (and the persons
    * variant `etl-persons/etl_persons.py:1056-1378`). Per-column rules on
    * matched rows:
    *   - existing NULL + new non-NULL  → take new
    *   - existing non-NULL + new NULL  → KEEP OLD (enrichment protection)
    *   - both non-NULL and different   → take new
    *   - columns in `overwriteCols` (dates from the API/parent) are always
    *     taken from staged.
    * Staged-only rows insert as-is; target-only rows are kept.
    */
  def smartMerge(
      target: DataFrame,
      staged: DataFrame,
      pk: Seq[String],
      overwriteCols: Set[String] = Set.empty): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(pk.contains)
    val s = staged.withColumn(SP, lit(true)).alias("s")
    val t = target.withColumn(TP, lit(true)).alias("t")
    val joined = s.join(t, keyCond(pk), "full_outer")
    val sPresent = col(s"s.$SP") <=> lit(true)
    val tPresent = col(s"t.$TP") <=> lit(true)
    val keyOut = pk.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k))
    val valOut = dataCols.map { c =>
      val merged =
        if (overwriteCols.contains(c)) col(s"s.$c")
        else coalesce(col(s"s.$c"), col(s"t.$c"))
      when(!tPresent, col(s"s.$c"))
        .when(!sPresent, col(s"t.$c"))
        .otherwise(merged)
        .as(c)
    }
    joined.select(keyOut ++ valOut: _*)
  }

  /** S8 — child-table cascade replace: drop ALL children of every parent
    * present in `staged`, then insert the staged children.
    *
    * Reference: IR child tables `etl-ir/ir_etl.py:743-773` (delete by
    * parent id, re-insert latest payload). This is the "replaceWhere"
    * partition-overwrite pattern: the anti-join key set is
    * `staged.parentKey` distinct, broadcastable for incremental deltas.
    */
  def childReplace(target: DataFrame, staged: DataFrame, parentKey: String): DataFrame =
    target
      .join(staged.select(parentKey).distinct(), Seq(parentKey), "left_anti")
      .unionByName(staged)

  /** S9 — append-if-absent (idempotent file loads).
    *
    * Reference: `etl-files/etl_pipeline_files/utils/idempotency.py:21,71` —
    * composite-key existence check before insert. Staged duplicates on the
    * key are collapsed deterministically by `tiebreak` (first row wins).
    */
  def appendIfAbsent(
      target: DataFrame,
      staged: DataFrame,
      keys: Seq[String],
      tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    val dedup = staged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    target.unionByName(
      dedup.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti"))
  }

  /** S10 — stub-row creation: for referenced keys missing from the target
    * dimension, append minimal rows (key + NULLs) so child FKs resolve;
    * later runs enrich them via smartMerge.
    *
    * Reference: `etl-accused/etl_accused.py:896-906` (`INSERT INTO
    * persons(person_id) ... ON CONFLICT DO NOTHING`).
    */
  def stubRows(target: DataFrame, referencedKeys: DataFrame, key: String): DataFrame = {
    val missing = referencedKeys
      .select(col(referencedKeys.columns.head).as(key))
      .na.drop()
      .distinct()
      .join(target.select(key), Seq(key), "left_anti")
    val stubs = target.columns.foldLeft(missing) {
      case (df, c) if c == key => df
      case (df, c) =>
        df.withColumn(c, lit(null).cast(target.schema(c).dataType))
    }
    target.unionByName(stubs.select(target.columns.map(col).toSeq: _*))
  }

  /** SCD2 — slowly-changing-dimension type-2 merge (beyond-reference;
    * the warehouse-standard history mechanism the reference's
    * change-detecting upsert discards).
    *
    * `current` must be the dimension in SCD2 shape — business key,
    * attribute columns, `valid_from`/`valid_to` DATEs, `is_current`
    * BOOLEAN. `batch` carries the key + the same attribute columns. Per
    * key: attrs unchanged → no-op; changed → the live row closes at
    * `effective` and a new open version inserts; unseen key → new open
    * version; keys absent from the batch are untouched. History
    * (non-current) rows pass through without joining.
    *
    * Scale (100 TB dim): ONE full-outer equi-join shuffled on the
    * business key; the 1-or-2 output rows per matched key come from an
    * exploded CASE array, so the dimension is scanned once and never
    * re-joined. History rides a union, not a shuffle. An incremental
    * delta batch broadcasts under AQE like every other kernel here.
    */
  def scd2Merge(
      current: DataFrame,
      batch: DataFrame,
      pk: String,
      attrs: Seq[String],
      effective: Column,
      openEnd: Column = lit("9999-12-31").cast("date")): DataFrame = {
    val live = current.filter(col("is_current")).withColumn(TP, lit(true)).alias("t")
    val hist = current.filter(!col("is_current"))
    val s = batch.withColumn(SP, lit(true)).alias("s")
    val joined = s.join(live, col(s"s.$pk") <=> col(s"t.$pk"), "full_outer")
    val sPresent = col(s"s.$SP") <=> lit(true)
    val tPresent = col(s"t.$TP") <=> lit(true)
    val same = attrs.map(c => col(s"s.$c") <=> col(s"t.$c")).reduce(_ && _)
    def rowOf(keyC: Column, attrC: String => Column, from: Column, to: Column,
        cur: Column): Column =
      struct(keyC.as(pk) +: attrs.map(c => attrC(c).as(c))
        :+ from.as("valid_from") :+ to.as("valid_to") :+ cur.as("is_current"): _*)
    val oldRow = rowOf(col(s"t.$pk"), c => col(s"t.$c"),
      col("t.valid_from"), col("t.valid_to"), col("t.is_current"))
    val closedRow = rowOf(col(s"t.$pk"), c => col(s"t.$c"),
      col("t.valid_from"), effective, lit(false))
    val newRow = rowOf(col(s"s.$pk"), c => col(s"s.$c"),
      effective, openEnd, lit(true))
    val arr = when(!sPresent, array(oldRow))
      .when(!tPresent, array(newRow))
      .when(same, array(oldRow))
      .otherwise(array(closedRow, newRow))
    joined.select(explode(arr).as("r")).select(col("r.*")).unionByName(hist)
  }
}
