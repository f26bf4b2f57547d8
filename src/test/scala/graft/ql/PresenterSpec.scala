package graft.ql

import org.scalatest.funsuite.AnyFunSuite

class PresenterSpec extends AnyFunSuite {

  test("labels strip short table prefixes and title-case snake_case") {
    assert(Presenter.label("o_orderdate") == "Orderdate")
    assert(Presenter.label("total_price") == "Total Price")
    assert(Presenter.label("ps_supplycost") == "Supplycost")
    assert(Presenter.label("status") == "Status")
  }

  test("priority fields come first, remainder keeps query order") {
    val cols = Seq("o_totalprice", "o_orderkey", "o_orderstatus", "o_comment")
    val order = Presenter.fieldOrder(cols, Seq("id", "key", "name", "status", "date"))
    assert(order == Seq(1, 2, 0, 3))
  }

  test("record cards + statistics are byte-stable") {
    val out = Presenter.present(
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
      Seq(Seq(1L, "F", 100.5), Seq(2L, "O", 200.25), Seq(3L, "F", 50.0)),
      Presenter.Config(maxRecords = 2))
    val expected =
      """3 record(s), showing first 2
        |--- record 1 ---
        |  Orderkey    : 1
        |  Orderstatus : F
        |  Totalprice  : 100.5
        |--- record 2 ---
        |  Orderkey    : 2
        |  Orderstatus : O
        |  Totalprice  : 200.25
        |--- statistics ---
        |  Orderkey    : min 1.0000 / max 3.0000 / mean 2.0000
        |  Orderstatus : 2 distinct / top 'F' x2
        |  Totalprice  : min 50.0000 / max 200.2500 / mean 116.9167
        |""".stripMargin
    assert(out == expected, s"\n---got---\n$out\n---want---\n$expected")
  }

  test("long values truncate; nulls render as dashes and stay out of stats") {
    val out = Presenter.present(
      Seq("name", "note"),
      Seq(Seq("x" * 80, null), Seq("ab", "k")),
      Presenter.Config(maxRecords = 5, maxFieldLen = 10))
    assert(out.contains("xxxxxxxxx~"))
    assert(out.contains("Note : -"))
    assert(out.contains("Note : 1 distinct / top 'k' x1"))
  }

  test("mode tie-break is lexicographic, not input-order") {
    val a = Presenter.present(Seq("s"), Seq(Seq("b"), Seq("a")),
      Presenter.Config(showStats = true))
    val b = Presenter.present(Seq("s"), Seq(Seq("a"), Seq("b")),
      Presenter.Config(showStats = true))
    assert(a.linesIterator.toSeq.last == b.linesIterator.toSeq.last)
    assert(a.contains("top 'a' x1"))
  }
}
