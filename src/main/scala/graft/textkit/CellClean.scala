package graft.textkit

import Py._
import Numbers.digitsOnly
import TextNormalize.{normalizeLigatures, normalizeMojibakeText}
import Predicates.isSpacedText

/** Table cell/header cleaning chains and OCR-replacement decisions.
  *
  * Semantics derived from
  * /root/reference/src/pdf_to_markdown_docling/table_fixes.py:16-253,424-583.
  * Each step of `cleanTableCellText` mirrors the ordered composition at
  * table_fixes.py:518-545; the order is load-bearing.
  */
object CellClean {
  private val DatePattern = re("\\d{1,2}[./-]\\d{1,2}[./-]\\d{2,4}")
  private val DateFuzzyPattern = re("\\d{1,3}[./-]\\d{1,2}[./-]\\d{2,4}")
  private val DateSepPattern = re("[./-]")
  private val DupPercent = re("\\b(\\d+(?:[.,]\\d+)?)\\s*%\\s+\\1\\s*%")
  private val SpacedPercent = re("\\b(\\d+(?:[.,]\\d+)?)\\s*%")
  private val DupGroup = re("\\b(\\d{1,3})\\s+\\1((?:\\.\\d{3}){1,})\\b")
  private val LeadingGroup = re("\\b(\\d{1,2})\\s+(\\d{3}(?:\\.\\d{3}){1,})\\b")
  private val DeltaPercent = re("^(?:ƒ\\^\\+%|∆\\s*%|Δ\\s*%)$")
  private val CurrencyPrefixDup = re("^(\\d{1,3}(?:[.,]\\d{1,3})?[.,]?)\\s+(RON|EUR)\\s+(\\d{1,3}(?:\\.\\d{3}){1,})$")
  private val CurrencySuffix = re("^(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)\\s+(RON|EUR)$")
  private val CurrencyMissingR = re("^(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)\\s+ON$")
  private val CurrencyRepeatPrefix = re("^(RON|EUR)\\s+(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)\\s+\\1\\s+\\2$")
  private val CurrencyRepeatSuffix = re("^(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)\\s+(RON|EUR)\\s+\\1\\s+\\2$")
  private val CurrencyExtraPrefix = re("^(\\d{1,3})\\s+(RON|EUR)\\s+(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)\\s+\\2$")
  private val CurrencyOnMiddle = re("^(\\d{1,3}(?:[.,]\\d+)?)\\s+ON\\s+(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)\\s+(RON|EUR)$")
  private val CurrencyPrefixOnly = re("^(\\d{1,2})\\s+(RON|EUR)\\s+(\\d{1,3}(?:\\.\\d{3}){1,}(?:[.,]\\d+)?)$")
  private val CurrencyRoToken = re("\\bRO\\b")
  val CurrencyToken = re("\\b(RON|EUR)\\b")
  private val NumberToken = re("[+-]?\\(?[.,]?\\d[\\d.,]*\\)?")
  private val CurrencyTrailingShort = re("^(\\d{1,3}(?:\\.\\d{3}){1,})\\s+(RON|EUR)\\s+(\\d{1,2})$")
  private val ParensSpaceOpen = re("\\(\\s+(?=\\d)")
  private val ParensSpaceClose = re("(?<=\\d)\\s+\\)")
  private val NegativeSpace = re("(?<!\\w)-\\s+(?=\\d)")
  private val NumericishFull = re("[0-9\\s.,()%+A-Z-]+")
  private val DigitsOnlyAllPattern = re("[\\d\\s./-]+")

  /** table_fixes.py:59-60 */
  def isNumericish(text: String): Boolean = {
    // ASCII fast path: for pure-ASCII input the uppercase+regex decision
    // reduces to a per-char class check (uppercasing ASCII stays ASCII, and
    // \s under UNICODE_CHARACTER_CLASS intersected with ASCII is exactly
    // {\t \n  \f \r ' '}); any non-ASCII char falls back to the regex
    val n = text.length
    var i = 0
    var ok = n > 0
    while (ok && i < n) {
      val c = text.charAt(i)
      if (c >= 128) {
        return fullMatch(NumericishFull, text.toUpperCase(java.util.Locale.ROOT))
      }
      ok = (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        c == '.' || c == ',' || c == '(' || c == ')' || c == '%' || c == '+' ||
        c == '-' || c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      i += 1
    }
    ok
  }

  /** table_fixes.py:67-82 — (currency?, numberToken) or None. */
  def extractCurrencyNumber(text: String): Option[(Option[String], String)] = {
    // no digit -> every NumberToken match fails digitsOnly -> None
    if (!anyDigit(text)) return None
    val normalized = joinSplit(text)
    val currencies = findAllGroup1(CurrencyToken, normalized).toSet
    val numbers = findAll(NumberToken, normalized).filter(n => digitsOnly(n).nonEmpty)
    if (numbers.isEmpty) return None
    if (currencies.nonEmpty) {
      if (currencies.size != 1 || numbers.length != 1) return None
      return Some((Some(currencies.head), numbers.head))
    }
    if (anyAlpha(normalized)) return None
    if (numbers.length != 1) return None
    Some((None, numbers.head))
  }

  /** table_fixes.py:85-88 */
  def normalizeNumberToken(token: String): String =
    lstripChars(stripChars(token.strip(), "()"), "+-").replace(" ", "")

  /** table_fixes.py:91-115 — groups-of-3 thousands validation. */
  def numberGroupingIsValid(token: String): Boolean = {
    var normalized = normalizeNumberToken(token)
    if (normalized.isEmpty) return false
    val first = normalized.head
    val last = normalized.last
    if (first == '.' || first == ',' || last == '.' || last == ',') return false
    if (normalized.contains(",") && normalized.contains(".")) {
      if (normalized.lastIndexOf(",") > normalized.lastIndexOf("."))
        normalized = normalized.split(",", 2)(0)
      else normalized = normalized.replace(",", "")
    } else if (normalized.contains(",")) {
      if (normalized.count(_ == ',') == 1) normalized = normalized.split(",", 2)(0)
      normalized = normalized.replace(",", "")
    }
    if (!normalized.contains(".")) return true
    val groups = normalized.split("\\.", -1)
    if (groups(0).isEmpty) return false
    groups.drop(1).forall(_.length == 3)
  }

  /** table_fixes.py:118-122 */
  def isNegativeNumberText(text: String): Boolean = {
    val stripped = text.strip()
    stripped.startsWith("-") || (stripped.contains("(") && stripped.contains(")"))
  }

  /** table_fixes.py:125-135 */
  def isSuspectCurrencyCell(text: String): Boolean = {
    extractCurrencyNumber(text) match {
      case None => false
      case Some((_, number)) =>
        val normalized = normalizeNumberToken(number)
        if (normalized.isEmpty) false
        else if (normalized.head == '.' || normalized.head == ',' ||
                 normalized.last == '.' || normalized.last == ',') true
        else !numberGroupingIsValid(normalized)
    }
  }

  /** table_fixes.py:138-154 */
  def stripTrailingCurrencyFragment(text: String): String = {
    // tokens.last ends with the last non-space char; {R,E,N,ON} all end in
    // R/E/N, so anything else exits before tokenizing
    var k = text.length - 1
    while (k >= 0 && text.charAt(k) <= ' ') k -= 1
    if (k < 0) return text
    val lc = text.charAt(k)
    if (lc != 'R' && lc != 'E' && lc != 'N') return text
    val tokens = split(text)
    if (tokens.length < 3) return text
    val lastTok = tokens.last
    if (!Set("R", "E", "N", "ON").contains(lastTok)) return text
    if (lastTok == "ON") {
      if (!tokens.contains("RON")) return text
      if (digitsOnly(tokens(tokens.length - 2)).isEmpty) return text
      return tokens.dropRight(1).mkString(" ")
    }
    if (!tokens.contains("RON") && !tokens.contains("EUR")) return text
    if (digitsOnly(tokens(tokens.length - 2)).isEmpty) return text
    tokens.dropRight(1).mkString(" ")
  }

  // the anchored currency patterns all require a literal RON or EUR; a cell
  // with neither an 'R' nor an 'E' cannot match any of them
  private def hasCurrencyLetter(text: String): Boolean =
    text.indexOf('R') >= 0 || text.indexOf('E') >= 0

  /** table_fixes.py:157-165 */
  def stripCurrencyPrefixDup(text: String): String =
    if (!hasCurrencyLetter(text)) text
    else matchAt(CurrencyPrefixDup, text) match {
      case Some(m) if m.end == text.length =>
        val prefix = digitsOnly(m.group(1))
        val value = digitsOnly(m.group(3))
        if (prefix.nonEmpty && value.startsWith(prefix)) s"${m.group(2)} ${m.group(3)}" else text
      case _ => text
    }

  /** table_fixes.py:168-172 */
  def stripCurrencyTrailingShortToken(text: String): String =
    if (!hasCurrencyLetter(text)) text
    else matchAt(CurrencyTrailingShort, text) match {
      case Some(m) => s"${m.group(2)} ${m.group(1)}"
      case None => text
    }

  /** table_fixes.py:175-185 */
  def stripDuplicateCurrencySuffix(text: String): String = {
    if (!hasCurrencyLetter(text)) return text
    val tokens = split(text)
    if (tokens.length < 3) return text
    if (tokens(0) != "RON" && tokens(0) != "EUR") return text
    if (tokens.last != tokens(0)) return text
    if (!anyDigit(tokens(1))) return text
    tokens.dropRight(1).mkString(" ")
  }

  private val DigitSpDigit = re("(?<=\\d)\\s+(?=\\d)")
  private val DigitSpPunct = re("(?<=\\d)\\s+(?=[.,])")
  private val PunctSpDigit = re("(?<=[.,])\\s+(?=\\d)")
  private val MultiWs = re("\\s{2,}")
  /** table_fixes.py:188-195 */
  def compactNumberSpacing(text: String): String = {
    if (!isNumericish(text)) return text
    // every sub needs a \s and strip only removes edge whitespace: a
    // whitespace-free string is unchanged. isWhitespace || isSpaceChar
    // covers the Unicode White_Space set the regexes' \s uses EXCEPT
    // U+0085 (NEL, category Cc) — include it explicitly
    if (!text.exists(c => Character.isWhitespace(c) || Character.isSpaceChar(c) ||
        c == '\u0085'))
      return text
    var compacted = sub(DigitSpDigit, "", text)
    compacted = sub(DigitSpPunct, "", compacted)
    compacted = sub(PunctSpDigit, "", compacted)
    compacted = sub(MultiWs, " ", compacted)
    compacted.strip()
  }

  /** table_fixes.py:198-202 */
  def normalizeCurrencySuffix(text: String): String =
    if (!hasCurrencyLetter(text)) text
    else matchAt(CurrencySuffix, text) match {
      case Some(m) => s"${m.group(2)} ${m.group(1)}"
      case None => text
    }

  /** table_fixes.py:205-211 */
  def fixMissingCurrencyLetter(text: String): String =
    // both branches need a literal "ON" or "RO" — no 'O', no match
    if (text.indexOf('O') < 0) text
    else matchAt(CurrencyMissingR, text) match {
      case Some(m) => s"RON ${m.group(1)}"
      case None =>
        if (isNumericish(text) && hasMatch(CurrencyRoToken, text) && !text.contains("RON"))
          sub(CurrencyRoToken, "RON", text)
        else text
    }

  /** table_fixes.py:214-236 */
  def dedupeRepeatedCurrencyValue(text: String): String = {
    if (!hasCurrencyLetter(text)) return text
    matchAt(CurrencyRepeatPrefix, text).foreach { m =>
      return s"${m.group(1)} ${m.group(2)}"
    }
    matchAt(CurrencyRepeatSuffix, text).foreach { m =>
      return s"${m.group(2)} ${m.group(1)}"
    }
    matchAt(CurrencyExtraPrefix, text).foreach { m =>
      return s"${m.group(2)} ${m.group(3)}"
    }
    matchAt(CurrencyOnMiddle, text).foreach { m =>
      val prefixDigits = digitsOnly(m.group(1))
      val valueDigits = digitsOnly(m.group(2))
      if (prefixDigits.nonEmpty && valueDigits.startsWith(prefixDigits))
        return s"${m.group(3)} ${m.group(2)}"
    }
    matchAt(CurrencyPrefixOnly, text).foreach { m =>
      val prefixDigits = digitsOnly(m.group(1))
      val valueDigits = digitsOnly(m.group(3))
      if (prefixDigits.nonEmpty && !valueDigits.startsWith(prefixDigits))
        return s"${m.group(2)} ${m.group(3)}"
    }
    text
  }

  /** table_fixes.py:239-253 — keep 4-digit-year longest date. */
  def dedupeDatesInCell(text: String): String = {
    if (!anyDigit(text)) return text // a date match needs digits
    val dates = findAll(DatePattern, text)
    if (dates.length < 2) return text
    if (anyAlpha(text)) return text
    val scored = dates.map { date =>
      val parts = DateSepPattern.split(date, -1)
      val yearLen = if (parts.nonEmpty) parts.last.length else 0
      (yearLen, date.length, date)
    }
    // Python tuple sort: lexicographic on (year_len, len, text).
    val sorted = scored.sortBy(identity)(Ordering.Tuple3(Ordering.Int, Ordering.Int, Ordering.String))
    sorted.last._3
  }

  /** table_fixes.py:424-442 — ranked date choice. */
  def chooseDateMatch(matches: List[(Int, String)]): String = {
    var candidates = matches.map { case (startIdx, dateText) =>
      val parts = DateSepPattern.split(dateText, -1)
      val yearLen = if (parts.nonEmpty) parts.last.length else 0
      val dayLen = if (parts.nonEmpty) parts.head.length else 0
      (startIdx, yearLen, dayLen, dateText)
    }
    val preferred = candidates.filter(_._2 == 4)
    if (preferred.nonEmpty) candidates = preferred
    val dayPreferred = candidates.filter(_._3 == 2)
    if (dayPreferred.nonEmpty) candidates = dayPreferred
    candidates.sortBy(_._1).last._4
  }

  /** table_fixes.py:445-447 — overlapping matches via lookahead wrapper. */
  def overlappingDateMatches(pattern: java.util.regex.Pattern, text: String): List[(Int, String)] = {
    val wrapped = re(s"(?=(${pattern.pattern}))")
    val m = wrapped.matcher(text)
    val out = List.newBuilder[(Int, String)]
    // java.util.regex advances past zero-width matches automatically,
    // matching CPython finditer-over-lookahead behavior.
    while (m.find()) out += ((m.start, m.group(1)))
    out.result()
  }

  /** table_fixes.py:450-463 */
  def repairFuzzyDate(dateText: String): String = {
    search(DateSepPattern, dateText) match {
      case None => dateText
      case Some(sepM) =>
        val sep = sepM.group()
        val parts = DateSepPattern.split(dateText, -1)
        if (parts.length != 3) return dateText
        var day = parts(0); var month = parts(1); val year = parts(2)
        if (day.length > 2) day = day.takeRight(2)
        if (month.length > 2) month = month.takeRight(2)
        List(day, month, year).mkString(sep)
    }
  }

  /** table_fixes.py:466-507 — header-cleaning chain. */
  def cleanHeaderText(text: String): String = {
    if (text == null || text.isEmpty) return text
    var normalized = normalizeLigatures(normalizeMojibakeText(text))
    normalized = joinSplit(normalized)
    if (fullMatch(DeltaPercent, normalized)) return "Δ%"
    val dateMatches = findIter(DatePattern, normalized)
    var chosenYearLen = 0
    if (dateMatches.nonEmpty) {
      val chosen = chooseDateMatch(dateMatches)
      chosenYearLen = DateSepPattern.split(chosen, -1).last.length
      val hasFullYear = dateMatches.exists { case (_, d) =>
        DateSepPattern.split(d, -1).last.length == 4
      }
      if (dateMatches.length > 1 && (hasFullYear || chosenYearLen == 4)) return chosen
      if (normalized != chosen && fullMatch(DigitsOnlyAllPattern, normalized) && chosenYearLen == 4)
        return chosen
    }
    if (chosenYearLen < 4 &&
        normalized.count(_ == '/') + normalized.count(_ == '.') + normalized.count(_ == '-') > 2) {
      val fuzzyMatches = overlappingDateMatches(DateFuzzyPattern, normalized)
      if (fuzzyMatches.nonEmpty) {
        val fuzzyChosen = chooseDateMatch(fuzzyMatches)
        val repaired = repairFuzzyDate(fuzzyChosen)
        if (normalized != repaired && fullMatch(DigitsOnlyAllPattern, normalized))
          return repaired
      }
    }
    val words = split(normalized)
    if (words.length % 2 == 0 && words.nonEmpty) {
      val mid = words.length / 2
      if (words.take(mid).sameElements(words.drop(mid))) return words.take(mid).mkString(" ")
    }
    normalized
  }

  /** table_fixes.py:510-515 */
  private def mergeLeadingGroup(m: java.util.regex.Matcher): String = {
    val lead = m.group(1)
    val tail = m.group(2)
    if (tail.count(_ == '.') >= 2) tail else s"$lead.$tail"
  }

  /** table_fixes.py:518-545 — the 15-step cell-cleaning chain (order matters). */
  def cleanTableCellText(text: String): String = {
    if (text == null || text.isEmpty) return text
    var cleaned = normalizeMojibakeText(text)
    cleaned = normalizeLigatures(cleaned).strip()
    // guards (round 6): each regex step runs only when the characters its
    // pattern literally requires are present — provably identical output,
    // and a typical already-clean cell skips most of the chain
    if (cleaned.nonEmpty) {
      val c0 = cleaned.charAt(0)
      if ((c0 == 'ƒ' || c0 == '∆' || c0 == 'Δ') && fullMatch(DeltaPercent, cleaned))
        return "Δ%"
    }
    if (cleaned.indexOf('%') >= 0) {
      cleaned = sub(DupPercent, "$1%", cleaned)
      cleaned = sub(SpacedPercent, "$1%", cleaned)
    }
    if (cleaned.indexOf('-') >= 0) cleaned = sub(NegativeSpace, "-", cleaned)
    if (cleaned.indexOf('.') >= 0 && anyDigit(cleaned)) {
      cleaned = sub(DupGroup, "$1$2", cleaned)
      cleaned = subFn(LeadingGroup, cleaned)(mergeLeadingGroup)
    }
    cleaned = joinSplit(cleaned)
    if (anyDigit(cleaned)) cleaned = stripChars(cleaned, "[]")
    cleaned = compactNumberSpacing(cleaned)
    if ((cleaned.indexOf('(') >= 0 || cleaned.indexOf(')') >= 0) && isNumericish(cleaned)) {
      cleaned = sub(ParensSpaceOpen, "(", cleaned)
      cleaned = sub(ParensSpaceClose, ")", cleaned)
    }
    cleaned = normalizeCurrencySuffix(cleaned)
    cleaned = fixMissingCurrencyLetter(cleaned)
    cleaned = stripCurrencyTrailingShortToken(cleaned)
    cleaned = dedupeDatesInCell(cleaned)
    cleaned = stripTrailingCurrencyFragment(cleaned)
    cleaned = stripCurrencyPrefixDup(cleaned)
    cleaned = stripDuplicateCurrencySuffix(cleaned)
    cleaned = dedupeRepeatedCurrencyValue(cleaned)
    cleaned
  }

  /** table_fixes.py:548-583 — OCR numeric-cell acceptance test. */
  def shouldReplaceNumericCell(baseText: String, ocrText: String): Boolean = {
    if (baseText == null || baseText.isEmpty || ocrText == null || ocrText.isEmpty) return false
    if (isSpacedText(ocrText)) return false
    val baseClean = cleanTableCellText(baseText)
    val ocrClean = cleanTableCellText(ocrText)
    if (baseClean == ocrClean) return false
    val baseInfo = extractCurrencyNumber(baseClean)
    val ocrInfo = extractCurrencyNumber(ocrClean)
    if (baseInfo.isEmpty || ocrInfo.isEmpty) return false
    val (baseCur, baseNum) = baseInfo.get
    val (ocrCur, ocrNum) = ocrInfo.get
    if (baseCur.isEmpty != ocrCur.isEmpty) return false
    if (baseCur.nonEmpty && ocrCur.nonEmpty && baseCur != ocrCur) return false
    if (isNegativeNumberText(baseClean) != isNegativeNumberText(ocrClean)) return false

    val baseDigits = digitsOnly(baseNum)
    val ocrDigits = digitsOnly(ocrNum)
    if (baseDigits.isEmpty || ocrDigits.isEmpty) return false
    if (ocrDigits.length <= baseDigits.length) return false
    if (!numberGroupingIsValid(ocrNum)) return false
    if (isSuspectCurrencyCell(baseClean)) return true
    if (ocrDigits.endsWith(baseDigits) && ocrDigits.length - baseDigits.length <= 2) return true
    false
  }
}
