package graft.textkit

import Py._

/** Chart-noise predicates (axis/date/KPI) used by the picture-overlap deletes
  * and KPI caption extraction.
  *
  * Semantics derived from
  * /root/reference/src/pdf_to_markdown_docling/date_cleanup.py:13-70 and
  * picture_kpi_extract.py:23-30,122-193.
  */
object KpiAxis {
  private val DateOnlyPattern = re("^\\d{2}[./-]\\d{2}[./-]\\d{4}$")
  private val AxisAllowedPattern = re("^[0-9A-Za-z%./+\\-\\s]+$")
  // date_cleanup.py:15-18 — note the reference's own copy has an escaping quirk
  // (`mil\\.?` inside a raw string); the effective alternatives match ours.
  private val AxisTokenPattern = reI("^(?:\\d{1,4}(?:[.,]\\d+)?%?|[12]\\d{3}|Q[1-4]|9L|L9|mil|mil\\.|RON|EUR|USD|LEI)$")
  private val AxisWordToken = re("[A-Za-z0-9%]+")

  private val NumToken = re("\\d{1,3}(?:[.,]\\d{3})+(?:[.,]\\d+)?|\\d+(?:[.,]\\d+)?")
  private val CurrencyToken = reI("\\b(?:RON|EUR|USD|LEI)\\b")
  private val AxisUnitToken = reI("\\b(?:mil\\.?|mii|milioane?)\\b")
  private val KeywordToken = reI("\\b(?:profit\\w*|cifr\\w*|venit\\w*|active\\w*|ebitda\\w*|marj\\w*|rezultat\\w*|capital\\w*)\\b")
  private val AlphaTok = re("[^\\W\\d_]+")
  private val CurrencyWords = Set("ron", "eur", "usd", "lei")

  /** date_cleanup.py:50-51 */
  def dateOnly(text: String): Boolean = hasMatch(DateOnlyPattern, text.strip())

  /** date_cleanup.py:54-70 (same battery as export_utils._is_axis_like_line) */
  def axisLike(text: String): Boolean = {
    val stripped = text.strip()
    if (stripped.isEmpty || stripped.length > 40) return false
    if (!AxisAllowedPattern.matcher(stripped).lookingAt()) return false
    val tokens = findAll(AxisWordToken, stripped)
    if (tokens.isEmpty || tokens.length > 6) return false
    val numericTokens = tokens.count(anyDigit)
    if (numericTokens == 0) return false
    if (tokens.forall(t => fullMatch(AxisTokenPattern, t))) return true
    if (numericTokens >= tokens.length - 1 && stripped.length <= 20) return true
    false
  }

  /** picture_kpi_extract.py:137-161 — chart-axis tick detector. */
  def isAxisLikePicture(text: String): Boolean = {
    val numbers = findAll(NumToken, text)
    if (numbers.length < 4) return false
    if (numbers.exists(n => n.contains(".") || n.contains(","))) return false
    var smallTicks = 0
    var largeNonYear = false
    for (num <- numbers) {
      val cleaned = num.replace(".", "").replace(",", "")
      if (isDigitStr(cleaned)) {
        val value = BigInt(cleaned)
        if (value <= 200) smallTicks += 1
        if (value >= 1000 && !(value >= 1900 && value <= 2100)) largeNonYear = true
      }
    }
    if (largeNonYear) return false
    if (smallTicks < 4) return false
    hasMatch(AxisUnitToken, text) || hasMatch(CurrencyToken, text)
  }

  /** picture_kpi_extract.py:164-193 — KPI candidate text detector. */
  def isKpiText(text: String): Boolean = {
    if (text == null || text.length < 8) return false
    val numTokens = findAll(NumToken, text)
    if (numTokens.isEmpty) return false
    if (numTokens.length > 12) return false
    val hasCurrency = hasMatch(CurrencyToken, text)
    val hasPercent = text.contains("%")
    val hasKeyword = hasMatch(KeywordToken, text)
    val alphaTokens = findAll(AlphaTok, text)
    if (alphaTokens.isEmpty) return false
    val nonCurrency = alphaTokens.filterNot(t => CurrencyWords.contains(t.toLowerCase(java.util.Locale.ROOT)))
    if (nonCurrency.isEmpty) return false
    if (isAxisLikePicture(text)) return false
    if (!(hasCurrency || hasPercent || hasKeyword)) return false
    if (text.length > 300) return false
    if (text.count(_ == '\n') > 8) return false
    true
  }

  private val WsRun = re("\\s+")
  private val WsBeforePunct = re("\\s+([,.;:%])")
  private val ParenOpenWs = re("\\(\\s+")
  private val WsParenClose = re("\\s+\\)")
  private val MilRon = reI("(\\b\\d[\\d.,]*\\s*mil\\.?)\\s+ron\\b")
  /** picture_kpi_extract.py:122-134 — join multi-line caption, tighten punctuation. */
  def normalizeKpiCaption(text: String): String = {
    val lines = splitLines(text).map(_.strip()).filter(_.nonEmpty)
    if (lines.isEmpty) return ""
    var joined = lines.mkString(" ")
    joined = sub(WsRun, " ", joined).strip()
    joined = sub(WsBeforePunct, "$1", joined)
    joined = sub(ParenOpenWs, "(", joined)
    joined = sub(WsParenClose, ")", joined)
    joined = sub(MilRon, "RON $1", joined)
    joined
  }

  /** Geometry shared by the spatial semi-joins
    * (table_fixes.py:285-298, date_cleanup.py:27-47). */
  def bboxArea(l: Double, t: Double, r: Double, b: Double): Double =
    math.max(0.0, r - l) * math.max(0.0, b - t)

  def bboxIntersectionArea(al: Double, at: Double, ar: Double, ab: Double,
                           bl: Double, bt: Double, br: Double, bb: Double): Double = {
    val left = math.max(al, bl)
    val right = math.min(ar, br)
    val top = math.max(at, bt)
    val bottom = math.min(ab, bb)
    math.max(0.0, right - left) * math.max(0.0, bottom - top)
  }

  /** date_cleanup.py:43-47 — overlap as fraction of the first bbox. */
  def overlapRatio(al: Double, at: Double, ar: Double, ab: Double,
                   bl: Double, bt: Double, br: Double, bb: Double): Double = {
    val areaA = bboxArea(al, at, ar, ab)
    if (areaA <= 0) 0.0
    else bboxIntersectionArea(al, at, ar, ab, bl, bt, br, bb) / areaA
  }
}
