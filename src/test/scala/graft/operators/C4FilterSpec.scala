package graft.operators

import graft.SparkSpec

/** Pins [[TextAnalysis.c4Filter]] line and page rules on hand-built
  * pages where every rule fires independently.
  */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private val rules = TextAnalysis.C4Rules(badWords = Seq("badword"))

  private def run(pages: (Long, String)*) =
    TextAnalysis.c4Filter(pages.toDF("doc_id", "text"), rules)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("line rules: terminal punctuation, min words, javascript") {
    val page = Seq(
      "this line has enough words and ends well.", // kept
      "short line.",                               // <5 words
      "this line has enough words but no terminal punct", // no punct
      "this javascript line has many words here!", // javascript
      "does this question line count as kept too?" // kept (?)
    ).mkString("\n")
    val r = run(1L -> page)(1L)
    assert(r.getAs[Long]("n_lines") == 5)
    assert(r.getAs[Long]("n_kept_lines") == 2)
    assert(r.getAs[String]("clean_text") ==
      "this line has enough words and ends well.\n" +
        "does this question line count as kept too?")
    assert(r.getAs[Long]("kept_tokens") == 8 + 8)
  }

  test("page flags and keep verdict") {
    val good = Seq.fill(3)("a perfectly fine content line right here.").mkString("\n")
    val lorem = good + "\nsome Lorem Ipsum dolor filler appears here."
    val brace = good + "\nvar f = function() { return 1; }"
    val bad = good + "\nthis line mentions badword explicitly and loudly."
    val short = "a perfectly fine content line right here."
    val m = run(1L -> good, 2L -> lorem, 3L -> brace, 4L -> bad, 5L -> short)
    assert(m(1L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Boolean]("has_lorem") && !m(2L).getAs[Boolean]("keep"))
    assert(m(3L).getAs[Boolean]("has_brace") && !m(3L).getAs[Boolean]("keep"))
    assert(m(4L).getAs[Boolean]("has_badword") && !m(4L).getAs[Boolean]("keep"))
    assert(!m(5L).getAs[Boolean]("keep") &&
      m(5L).getAs[Long]("n_kept_lines") == 1) // dropped purely on line count
  }

  test("CRLF line endings do not leak a trailing \\r into the rules") {
    val page = Seq.fill(3)("a perfectly fine content line right here.")
      .mkString("\r\n")
    val r = run(8L -> page)(8L)
    assert(r.getAs[Long]("n_lines") == 3 && r.getAs[Long]("n_kept_lines") == 3)
    assert(!r.getAs[String]("clean_text").contains("\r"))
    assert(r.getAs[Boolean]("keep"))
  }

  test("badword matches whole tokens only") {
    val page = Seq.fill(3)("notabadwordhere is a compound token line.").mkString("\n")
    val m = run(7L -> page)
    assert(!m(7L).getAs[Boolean]("has_badword"))
    assert(m(7L).getAs[Boolean]("keep"))
  }
}
