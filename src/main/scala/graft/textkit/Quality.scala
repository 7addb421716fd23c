package graft.textkit

import Py._

/** Markdown quality scoring (backend auto-probe oracle).
  * Semantics derived from
  * /root/reference/src/pdf_to_markdown_docling/quality.py:17-53.
  */
object Quality {
  case class QualityReport(score: Int, shortLineCount: Int, repeatedLineCount: Int,
                           controlCharCount: Int)

  private def isNoiseLine(line: String): Boolean =
    line.isEmpty || line.startsWith("<!-- image") || line.startsWith("<!-- page break") ||
      line.startsWith("#")

  def scoreMarkdown(text: String): QualityReport = {
    val lines = splitLines(text).map(_.strip())

    val shortLines = lines.count { line =>
      line.nonEmpty && line.replace(" ", "").length <= 4 && anyAlpha(line)
    }

    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for (line <- lines if line.length >= 6 && !isNoiseLine(line)) {
      val k = line.toLowerCase(java.util.Locale.ROOT)
      counts(k) = counts.getOrElse(k, 0) + 1
    }
    val repeatedLines = counts.count(_._2 >= 3)

    val controlChars = text.count(ch => ch.toInt < 32 && ch != '\n' && ch != '\t')

    val score = 100 - 5 * shortLines - 2 * repeatedLines - controlChars
    QualityReport(math.max(score, 0), shortLines, repeatedLines, controlChars)
  }

  /** CLI report line (quality.py:56-63 — scripts/quality_report.py output). */
  def formatReport(r: QualityReport): String =
    s"score=${r.score} short_lines=${r.shortLineCount} " +
      s"repeated_lines=${r.repeatedLineCount} control_chars=${r.controlCharCount}"
}
