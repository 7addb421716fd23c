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
    val collapsed = sub(MultiSpaceBetween, " ", text)
    // Restore ratio notation when OCR drops the slash ("A B" -> "A/B").
    sub(TrailingRatio, "$1/$2", collapsed)
  }
}
