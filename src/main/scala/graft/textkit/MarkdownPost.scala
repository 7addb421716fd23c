package graft.textkit

import Py._
import java.util.Locale

/** Markdown-level structural post-processing, applied in the exact order of
  * the reference pipeline (conversion_utils.py:276-284): visible page markers
  * -> noise reduction -> KPI blocks -> orphan headings -> axis lines.
  *
  * Semantics derived from
  * /root/reference/src/pdf_to_markdown_docling/export_utils.py:11-379.
  */
object MarkdownPost {
  val PageBreakPlaceholder = "<!-- page break -->"

  private val HtmlPageMarker = "<!--\\s*page:\\s*(\\d+)\\s*-->"
  private val MdPageMarker = "\\[//\\]:\\s*#\\s*\\(\\s*page:\\s*(\\d+)\\s*\\)"
  private val VisiblePageMarker = "\\*\\*\\s*\\[page(?::)?\\s*\\d+\\]\\s*\\*\\*"
  private val PageMarkerPattern = reI(s"(?:$HtmlPageMarker|$MdPageMarker|$VisiblePageMarker)")
  private val ImagePlaceholderPattern = re("^\\s*<!--\\s*image\\s*-->\\s*$")
  private val HeadingPattern = re("^(#{1,6})\\s+(.+?)\\s*$")
  private val KpiUnitPattern = reI("\\b(?:RON|EUR|USD|LEI|MIL\\.?)\\b")
  private val KpiValueHintPattern = reI("\\bvs\\b|%|\\d")
  private val AxisAllowedPattern = re("^[0-9A-Za-z%./+\\-\\s]+$")
  private val AxisTokenPattern = reI("^(?:\\d{1,4}(?:[.,]\\d+)?%?|[12]\\d{3}|Q[1-4]|9L|L9|mil|mil\\.|RON|EUR|USD|LEI)$")
  private val AxisWordToken = re("[A-Za-z0-9%]+")
  private val BlockSplit = re("\\n{2,}")

  /** replaceAll(PageMarkerPattern, "") without running the alternation at
    * every position: a marker can only start at "<!--", "[//]" or "**", so
    * scan for those literals and try the regex only there (round 6 — this
    * pass ran the case-insensitive alternation over the whole document). */
  private def stripPageMarkers(markdown: String): String = {
    val n = markdown.length
    var sb: java.lang.StringBuilder = null
    var last = 0
    var i = 0
    val m = PageMarkerPattern.matcher(markdown)
    while (i < n) {
      val c = markdown.charAt(i)
      val candidate =
        (c == '<' && markdown.startsWith("<!--", i)) ||
          (c == '[' && markdown.startsWith("[//]", i)) ||
          (c == '*' && i + 1 < n && markdown.charAt(i + 1) == '*')
      if (candidate) {
        m.region(i, n)
        if (m.lookingAt()) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(markdown, last, i)
          last = m.end
          i = m.end
        } else i += 1
      } else i += 1
    }
    if (sb == null) markdown
    else { sb.append(markdown, last, n); sb.toString }
  }

  private def normalizeHeading(text: String): String =
    joinSplit(text).toLowerCase(Locale.ROOT)

  /** export_utils.py:44-61 */
  def addVisiblePageMarkers(markdown: String, placeholder: String = PageBreakPlaceholder): String = {
    val stripped = stripPageMarkers(markdown)
    if (!stripped.contains(placeholder)) {
      if (stripped.strip().isEmpty) return stripped
      return s"**[Page 1]**\n\n${stripped.strip()}"
    }
    val parts = stripped.split(java.util.regex.Pattern.quote(placeholder), -1).map(_.strip())
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pageNo = 1
    for (part <- parts if part.nonEmpty) {
      out += s"**[Page $pageNo]**\n\n$part"
      pageNo += 1
    }
    out.mkString(s"\n\n$placeholder\n\n")
  }

  /** export_utils.py:88-166 — repeated first-of-page heading removal. */
  def reduceMarkdownNoise(markdown: String, placeholder: String = PageBreakPlaceholder,
                          removeImagePlaceholders: Boolean = false,
                          repeatedHeadingRatio: Double = 0.3,
                          minRepeatedHeadingCount: Int = 3): String = {
    if (markdown.strip().isEmpty) return markdown
    val hasBreaks = markdown.contains(placeholder)
    val rawParts: Array[String] =
      if (hasBreaks) markdown.split(java.util.regex.Pattern.quote(placeholder), -1)
      else Array(markdown)

    val firstHeadings: Array[Option[String]] = rawParts.map { part =>
      var heading: Option[String] = None
      var done = false
      for (line <- splitLines(part) if !done) {
        val s = line.strip()
        if (s.nonEmpty && !maybeImagePlaceholder(s) && !maybePageMarker(s)) {
          heading = headingMatch(s).map(_.group(2))
          done = true
        }
      }
      heading
    }

    val totalPages = rawParts.length
    val frequent: Set[String] =
      if (totalPages <= 1) Set.empty
      else {
        val counts = scala.collection.mutable.Map.empty[String, Int]
        for (h <- firstHeadings.flatten) {
          val k = normalizeHeading(h)
          counts(k) = counts.getOrElse(k, 0) + 1
        }
        val threshold = math.max(minRepeatedHeadingCount,
          (totalPages * repeatedHeadingRatio + 0.999).toInt)
        counts.filter(_._2 >= threshold).keySet.toSet
      }

    val keptOnce = scala.collection.mutable.Set.empty[String]
    val cleanedParts = rawParts.zip(firstHeadings).map { case (part, headingOpt) =>
      val headingKey = headingOpt.map(normalizeHeading)
      val linesOut = scala.collection.mutable.ArrayBuffer.empty[String]
      var removedHeading = false
      for (line <- splitLines(part)) {
        val s = line.strip()
        var emit = true
        if (removeImagePlaceholders && maybeImagePlaceholder(s)) emit = false
        else if (!removedHeading && headingOpt.nonEmpty && headingKey.exists(frequent.contains) &&
                 s.nonEmpty) {
          headingMatch(s) match {
            case Some(m) if normalizeHeading(m.group(2)) == headingKey.get =>
              if (keptOnce.contains(headingKey.get)) { removedHeading = true; emit = false }
              else keptOnce += headingKey.get
            case _ =>
          }
        }
        if (emit) linesOut += line
      }
      linesOut.mkString("\n")
    }

    if (!hasBreaks) cleanedParts(0)
    else cleanedParts.mkString(s"\n\n$placeholder\n\n")
  }

  private def lookingAt(p: java.util.regex.Pattern, s: String): Boolean =
    p.matcher(s).lookingAt()
  private def fullMatchLookingAt(p: java.util.regex.Pattern, s: String): Boolean =
    p.matcher(s).lookingAt()

  // first-char guards (round 6): every alternative of PageMarkerPattern
  // starts with a literal '<', '[' or '*'; ImagePlaceholderPattern starts
  // with \s* then '<' (c < '!' / c > '~' conservatively covers every
  // possible \s char); HeadingPattern starts with a literal '#'. A plain
  // text line skips all three regexes on one char compare.
  private def maybePageMarker(s: String): Boolean = {
    if (s.isEmpty) return false
    val c = s.charAt(0)
    (c == '<' || c == '[' || c == '*') && lookingAt(PageMarkerPattern, s)
  }
  private def maybeImagePlaceholder(s: String): Boolean = {
    if (s.isEmpty) return false
    val c = s.charAt(0)
    (c == '<' || c < '!' || c > '~') && fullMatchLookingAt(ImagePlaceholderPattern, s)
  }
  private def headingMatch(s: String): Option[java.util.regex.Matcher] =
    if (s.isEmpty || s.charAt(0) != '#') None else matchAt(HeadingPattern, s)

  /** export_utils.py:169-182 — one allocation-free scan (round 6): newline,
    * token count (Py.split semantics), letter and uppercase counts all come
    * from a single pass; the checks themselves are unchanged. */
  def isKpiLabel(text: String): Boolean = {
    val stripped = text.strip()
    if (stripped.isEmpty) return false
    var i = 0
    var tokens = 0
    var inTok = false
    var letters = 0
    var upper = 0
    while (i < stripped.length) {
      val c = stripped.charAt(i)
      if (c == '\n') return false
      if (Py.isSplitWs(c)) inTok = false
      else {
        if (!inTok) { tokens += 1; inTok = true }
        if (Character.isLetter(c)) {
          letters += 1
          if (Character.isUpperCase(c)) upper += 1
        }
      }
      i += 1
    }
    if (stripped.charAt(0) == '#' && lookingAt(HeadingPattern, stripped)) return false
    if (tokens > 5) return false
    if (letters == 0) return false
    upper.toDouble / letters >= 0.7
  }

  /** export_utils.py:185-195 */
  def isKpiValue(text: String): Boolean = {
    val stripped = text.strip()
    if (stripped.isEmpty || stripped.contains("\n")) return false
    if (!hasMatch(KpiValueHintPattern, stripped)) return false
    if (hasMatch(KpiUnitPattern, stripped)) return true
    if (stripped.toLowerCase(Locale.ROOT).contains("vs") || stripped.contains("%")) return true
    false
  }

  /** export_utils.py:198-220 */
  def isHeadingLikeLine(text: String): Boolean = {
    val stripped = text.strip()
    if (stripped.isEmpty) return false
    if (stripped.charAt(0) == '#' && lookingAt(HeadingPattern, stripped)) return false
    if (maybePageMarker(stripped)) return false
    if (maybeImagePlaceholder(stripped)) return false
    if (anyDigit(stripped)) return false
    if (stripped.length > 120) return false
    if (Seq(".", "!", "?", ";", ":").exists(stripped.endsWith)) return false
    if (split(stripped).length < 3) return false
    val firstAlpha = stripped.find(Character.isLetter)
    firstAlpha.exists(Character.isUpperCase)
  }

  /** export_utils.py:223-260 — greedy KPI label+value merge. */
  def normalizeKpiBlocks(markdown: String, placeholder: String = PageBreakPlaceholder): String = {
    if (markdown.strip().isEmpty) return markdown
    val hasBreaks = markdown.contains(placeholder)
    val rawParts: Array[String] =
      if (hasBreaks) markdown.split(java.util.regex.Pattern.quote(placeholder), -1)
      else Array(markdown)

    val cleanedParts = rawParts.map { part =>
      val blocks = BlockSplit.split(part, -1).filter(_.strip().nonEmpty)
      val outBlocks = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < blocks.length) {
        val block = blocks(i).strip()
        var handled = false
        if (isKpiLabel(block)) {
          var merged = block
          var consumed = 1
          var j = i + 1
          val limit = math.min(i + 3, blocks.length)
          var stop = false
          while (j < limit && !stop) {
            val candidate = blocks(j).strip()
            if (isKpiValue(candidate)) {
              merged = s"$merged ${joinSplit(candidate)}"
              consumed += 1
            } else stop = true
            j += 1
          }
          if (consumed > 1) {
            outBlocks += merged
            i += consumed
            handled = true
          }
        }
        if (!handled) { outBlocks += block; i += 1 }
      }
      outBlocks.mkString("\n\n")
    }

    if (!hasBreaks) cleanedParts(0)
    else cleanedParts.mkString(s"\n\n$placeholder\n\n")
  }

  /** export_utils.py:263-279 */
  def isAxisLikeLine(text: String): Boolean = {
    val stripped = text.strip()
    if (stripped.isEmpty || stripped.length > 40) return false
    if (!anyDigit(stripped)) return false // numericTokens == 0 -> false on every path
    if (!lookingAt(AxisAllowedPattern, stripped)) return false
    val tokens = findAll(AxisWordToken, stripped)
    if (tokens.isEmpty || tokens.length > 6) return false
    val numericTokens = tokens.count(anyDigit)
    if (numericTokens == 0) return false
    if (tokens.forall(t => lookingAt(AxisTokenPattern, t) && fullMatch(AxisTokenPattern, t))) return true
    if (numericTokens >= tokens.length - 1 && stripped.length <= 20) return true
    false
  }

  /** export_utils.py:282-319 */
  def removeAxisLikeLines(markdown: String, placeholder: String = PageBreakPlaceholder): String = {
    if (markdown.strip().isEmpty) return markdown
    val hasBreaks = markdown.contains(placeholder)
    val rawParts: Array[String] =
      if (hasBreaks) markdown.split(java.util.regex.Pattern.quote(placeholder), -1)
      else Array(markdown)

    val cleanedParts = rawParts.map { part =>
      val linesOut = scala.collection.mutable.ArrayBuffer.empty[String]
      for (line <- splitLines(part)) {
        val s = line.strip()
        val keep =
          if (s.isEmpty) true
          else if (maybePageMarker(s)) true
          else if (maybeImagePlaceholder(s)) true
          else if (s.charAt(0) == '#' && lookingAt(HeadingPattern, s)) true
          else if (s.contains("|")) true
          else !isAxisLikeLine(s)
        if (keep) linesOut += line
      }
      linesOut.mkString("\n")
    }

    if (!hasBreaks) cleanedParts(0)
    else cleanedParts.mkString(s"\n\n$placeholder\n\n")
  }

  /** export_utils.py:322-379 — drop page-final headings with no follow-up. */
  def removeOrphanHeadings(markdown: String, placeholder: String = PageBreakPlaceholder): String = {
    if (markdown.strip().isEmpty) return markdown
    val hasBreaks = markdown.contains(placeholder)
    val rawParts: Array[String] =
      if (hasBreaks) markdown.split(java.util.regex.Pattern.quote(placeholder), -1)
      else Array(markdown)

    def nextMeaningfulLine(startIndex: Int): Option[String] = {
      var pi = startIndex
      while (pi < rawParts.length) {
        for (line <- splitLines(rawParts(pi))) {
          val s = line.strip()
          if (s.nonEmpty && !maybePageMarker(s) && !maybeImagePlaceholder(s)) return Some(s)
        }
        pi += 1
      }
      None
    }

    val cleanedParts = rawParts.zipWithIndex.map { case (partIn, idx) =>
      var part = partIn
      val lines = splitLines(part).toBuffer
      var lastIdx = -1
      var li = lines.length - 1
      while (li >= 0 && lastIdx == -1) {
        if (lines(li).strip().nonEmpty) lastIdx = li
        li -= 1
      }
      if (lastIdx == -1) part
      else {
        val stripped = lines(lastIdx).strip()
        headingMatch(stripped) match {
          case Some(m) =>
            val headingLevel = m.group(1).length
            nextMeaningfulLine(idx + 1) match {
              case None =>
                lines(lastIdx) = ""
                part = lines.mkString("\n").replaceAll("\\s+$", "")
              case Some(nextLine) =>
                val nextMatch = headingMatch(nextLine)
                val superseding = nextMatch.exists(_.group(1).length <= headingLevel)
                if (superseding || isHeadingLikeLine(nextLine)) {
                  lines(lastIdx) = ""
                  part = lines.mkString("\n").replaceAll("\\s+$", "")
                }
            }
            part
          case None => part
        }
      }
    }

    if (!hasBreaks) cleanedParts(0)
    else cleanedParts.mkString(s"\n\n$placeholder\n\n")
  }

  /** audit_utils.py:336-343 */
  def splitMarkdownPages(markdown: String, placeholder: String = PageBreakPlaceholder): List[String] = {
    if (!markdown.contains(placeholder)) return List(markdown)
    markdown.split(java.util.regex.Pattern.quote(placeholder), -1).toList
      .map(_.strip()).filter(_.nonEmpty)
  }

  /** audit_utils.py:214-215 */
  def markdownHeadingCount(markdown: String): Int =
    splitLines(markdown).count(_.stripLeading().startsWith("#"))

  /** audit_utils.py:218-227 */
  def markdownTableCount(markdown: String): Int = {
    val lines = splitLines(markdown)
    var count = 0
    for (i <- 1 until lines.length) {
      if (lines(i - 1).contains("|")) {
        val line = lines(i).strip()
        if (line.startsWith("|") && line.contains("---")) count += 1
      }
    }
    count
  }
}
