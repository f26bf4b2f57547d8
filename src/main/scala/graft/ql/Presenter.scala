package graft.ql

import java.util.Locale

/** Deterministic result presentation — the engine-side rebuild of the
  * reference's response formatter (`chatbot/agents/advanced_formatter.py`,
  * `narrative_formatter.py`): field aliasing + display labels, priority
  * field ordering, record cards with truncation, and a statistics footer.
  * Differences by design: pure function over an already-fetched
  * `(columns, rows)` page (never more than the guard's row cap reaches
  * the driver), ASCII output, no wall-clock — so the output is
  * byte-stable and spec-pinnable.
  */
object Presenter {

  final case class Config(
      maxRecords: Int = 5,
      maxFieldLen: Int = 60,
      showStats: Boolean = true,
      priorityFields: Seq[String] = Seq("id", "key", "name", "status", "date"))

  /** Display label: strip the TPC-H-style table prefix (`o_`, `l_`,
    * `ps_`…), split snake_case, title-case each word —
    * `o_orderdate` → "Orderdate", `total_price` → "Total Price". */
  def label(column: String): String = {
    val stripped = column.split("_").toList match {
      case p :: rest if p.length <= 2 && rest.nonEmpty => rest
      case parts => parts
    }
    stripped.map(w => if (w.isEmpty) w else w.head.toUpper +: w.tail).mkString(" ")
  }

  /** Priority fields first (by substring match on the canonical name, in
    * priority order), remaining columns in query order. */
  def fieldOrder(columns: Seq[String], priority: Seq[String]): Seq[Int] = {
    val idx = columns.indices
    val prio = priority.flatMap(p => idx.filter(i => columns(i).toLowerCase.contains(p)))
      .distinct
    prio ++ idx.filterNot(prio.contains)
  }

  private def fmt(v: Any, maxLen: Int): String = {
    val s = v match {
      case null => "-"
      case d: Double => new java.math.BigDecimal(d)
        .round(new java.math.MathContext(10)).toPlainString
      case other => other.toString
    }
    if (s.length > maxLen) s.take(maxLen - 1) + "~" else s
  }

  private def numeric(values: Seq[Any]): Option[Seq[Double]] = {
    val ds = values.collect {
      case n: Number => n.doubleValue()
      case s: String if s.nonEmpty && s.matches("-?\\d+(\\.\\d+)?") => s.toDouble
    }
    if (ds.nonEmpty && ds.length == values.count(_ != null)) Some(ds) else None
  }

  private def f4(d: Double): String = "%.4f".formatLocal(Locale.ROOT, d)

  /** Render a fetched result page as record cards + a stats footer. */
  def present(columns: Seq[String], rows: Seq[Seq[Any]],
      cfg: Config = Config()): String = {
    val sb = new StringBuilder
    val shown = rows.take(cfg.maxRecords)
    sb ++= s"${rows.length} record(s)"
    if (rows.length > shown.length) sb ++= s", showing first ${shown.length}"
    sb ++= "\n"
    val order = fieldOrder(columns, cfg.priorityFields)
    val labels = columns.map(label)
    val width = if (order.isEmpty) 0 else order.map(labels(_).length).max
    shown.zipWithIndex.foreach { case (row, i) =>
      sb ++= s"--- record ${i + 1} ---\n"
      order.foreach { c =>
        sb ++= s"  ${labels(c).padTo(width, ' ')} : ${fmt(row(c), cfg.maxFieldLen)}\n"
      }
    }
    if (cfg.showStats && rows.nonEmpty) {
      sb ++= "--- statistics ---\n"
      columns.indices.foreach { c =>
        val values = rows.map(_(c))
        val stat = numeric(values) match {
          case Some(ds) =>
            s"min ${f4(ds.min)} / max ${f4(ds.max)} / mean ${f4(ds.sum / ds.length)}"
          case None =>
            val nonNull = values.filter(_ != null).map(_.toString)
            val distinct = nonNull.distinct.length
            val mode = nonNull.groupBy(identity).toSeq
              .sortBy { case (v, g) => (-g.length, v) }
              .headOption.map { case (v, g) => s"top '${fmt(v, 30)}' x${g.length}" }
              .getOrElse("all null")
            s"$distinct distinct / $mode"
        }
        sb ++= s"  ${labels(c).padTo(width, ' ')} : $stat\n"
      }
    }
    sb.result()
  }
}
