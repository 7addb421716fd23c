package graft.textkit

import Py._

/** Whitespace normalization for text items.
  * Semantics derived from
  * /root/reference/src/pdf_to_markdown_docling/whitespace_fix.py:11-20.
  */
object Whitespace {
  private val MultiSpaceBetween = re("(?<=\\S)[ \\t]{2,}(?=\\S)")
  private val TrailingRatio = re("\\b([A-Z])\\s+([A-Z])\\b$")

  def normalizeTextWhitespace(text: String): String = {
    // guard (round 6): the collapse needs two adjacent space/tab chars
    var has2 = false
    var i = 1
    while (!has2 && i < text.length) {
      val a = text.charAt(i - 1)
      val b = text.charAt(i)
      has2 = (a == ' ' || a == '\t') && (b == ' ' || b == '\t')
      i += 1
    }
    val collapsed = if (has2) sub(MultiSpaceBetween, " ", text) else text
    // Restore ratio notation when OCR drops the slash ("A B" -> "A/B").
    // TrailingRatio ends ([A-Z])\b$ — without MULTILINE, $ also matches just
    // before one final line terminator, so check the char there too.
    if (endsUpper(collapsed)) sub(TrailingRatio, "$1/$2", collapsed) else collapsed
  }

  private def endsUpper(s: String): Boolean = {
    var j = s.length - 1
    if (j < 0) return false
    val c = s.charAt(j)
    if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029') {
      if (c == '\n' && j > 0 && s.charAt(j - 1) == '\r') j -= 2 else j -= 1
      if (j < 0) return false
    }
    val cc = s.charAt(j)
    cc >= 'A' && cc <= 'Z'
  }
}
