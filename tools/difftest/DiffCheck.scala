import graft.textkit._
import java.util.Base64
object DiffCheck { def main(a: Array[String]): Unit = {
  def d(s: String) = new String(Base64.getDecoder.decode(s), "UTF-8")
  var total = 0; var bad = 0
  for (line <- scala.io.Source.fromFile("/tmp/difftest/golden.tsv", "UTF-8").getLines()) {
    val f = line.split("\t", -1)
    val in = d(f(0))
    total += 1
    def chk(name: String, exp: String, got: String): Unit =
      if (exp != got && bad < 20) { bad += 1; println(s"MISMATCH $name in=[$in] exp=[$exp] got=[$got]") }
    chk("clean", d(f(1)), CellClean.cleanTableCellText(in))
    chk("header", d(f(2)), CellClean.cleanHeaderText(in))
    chk("spaced", f(3), if (Predicates.isSpacedText(in)) "1" else "0")
    chk("multi", f(4), if (Predicates.isMultiSpaceText(in)) "1" else "0")
    chk("collapsed", f(5), if (Predicates.isCollapsedText(in)) "1" else "0")
    chk("tablefix", f(6), if (Predicates.needsTableSpacingFix(in)) "1" else "0")
    chk("suspect", f(7), if (CellClean.isSuspectCurrencyCell(in)) "1" else "0")
    chk("grouping", f(8), if (CellClean.numberGroupingIsValid(in)) "1" else "0")
    chk("ws", d(f(9)), Whitespace.normalizeTextWhitespace(in))
    chk("moji", d(f(10)), TextNormalize.normalizeMojibakeText(in))
    chk("normnum", d(f(11)), Numbers.normalizeNumber(in))
    chk("axis", f(12), if (MarkdownPost.isAxisLikeLine(in)) "1" else "0")
    chk("kpilabel", f(13), if (MarkdownPost.isKpiLabel(in)) "1" else "0")
    chk("kpivalue", f(14), if (MarkdownPost.isKpiValue(in)) "1" else "0")
    chk("headinglike", f(15), if (MarkdownPost.isHeadingLikeLine(in)) "1" else "0")
    chk("quality", f(16), Quality.scoreMarkdown(in).score.toString)
  }
  println(s"checked $total cases, mismatching lines reported: $bad")
}}
