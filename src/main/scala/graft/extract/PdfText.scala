package graft.extract

import graft.textkit.SpacingRepair.Glyph
import scala.collection.mutable

/** Pure-JVM PDF text extraction: content-stream tokenizer -> positioned
  * glyph runs -> the 2-means line-reconstruction kernel (north_star bullet
  * (b): content-stream tokenize, glyph-run clustering into lines, reading-
  * order sort).
  *
  * Supports the uncompressed text subset the synthetic corpus emits (and
  * any conforming minimal PDF): object scan for stream objects, BT/ET text
  * blocks, Tf/Td/TD/TL/Tm/T* positioning, Tj/'/TJ show-text with kerning
  * adjustments, literal strings with escapes, fixed per-char advances from
  * a built-in Helvetica-like width table. No external libraries.
  *
  * Glyph y-coordinates are flipped to top-left origin so downstream bbox
  * logic matches the HTML path.
  */
object PdfText {
  /** Rough Helvetica advance widths (per mille of font size) — enough for
    * gap clustering; exact metrics are not required because thresholds are
    * relative (median char width). */
  private def advance(c: Char): Double = c match {
    case ' ' => 278
    case 'i' | 'l' | 'j' | '!' | '\'' | '.' | ',' | ':' | ';' | '|' => 240
    case 'f' | 't' | 'r' | '(' | ')' | '[' | ']' | '/' | '-' => 333
    case 'm' | 'M' | 'W' | 'w' => 889
    case c2 if c2.isUpper => 722
    case c2 if c2.isDigit => 556
    case _ => 556
  }

  /** Fallback advance for fonts without a /Widths table (PdfDoc). */
  private[extract] def advanceWidth(c: Char): Double = advance(c)

  private final class Lexer(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = {
      while (!eof && (s.charAt(i).isWhitespace || s.charAt(i) == '%')) {
        if (s.charAt(i) == '%') { while (!eof && s.charAt(i) != '\n') i += 1 }
        else i += 1
      }
    }
    /** next token: number, name, string, array delim, or operator */
    def next(): Option[PdfTok] = {
      skipWs()
      if (eof) return None
      val c = s.charAt(i)
      if (c == '(') {
        // literal string with escapes and balanced parens
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (!eof && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
              case '(' => sb += '('; case ')' => sb += ')'; case '\\' => sb += '\\'
              case other => sb += other
            }
            i += 2
          } else if (ch == '(') { depth += 1; sb += ch; i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb += ch; i += 1 }
          else { sb += ch; i += 1 }
        }
        Some(PdfStr(sb.result()))
      } else if (c == '[') { i += 1; Some(PdfArrOpen) }
      else if (c == ']') { i += 1; Some(PdfArrClose) }
      else if (c == '/') {
        val start = i; i += 1
        while (!eof && !s.charAt(i).isWhitespace && "()[]<>/".indexOf(s.charAt(i)) < 0) i += 1
        Some(PdfName(s.substring(start + 1, i)))
      } else if (c == '<' || c == '>') { i += 1; Some(PdfOther(c.toString)) }
      else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (!eof && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        try Some(PdfNum(s.substring(start, i).toDouble))
        catch { case _: NumberFormatException => Some(PdfOther(s.substring(start, i))) }
      } else {
        val start = i
        while (!eof && !s.charAt(i).isWhitespace && "()[]<>/%".indexOf(s.charAt(i)) < 0) i += 1
        if (i == start) { i += 1; Some(PdfOther(c.toString)) }
        else Some(PdfOp(s.substring(start, i)))
      }
    }
  }

  sealed trait PdfTok
  case class PdfNum(v: Double) extends PdfTok
  case class PdfStr(v: String) extends PdfTok
  case class PdfName(v: String) extends PdfTok
  case class PdfOp(v: String) extends PdfTok
  case object PdfArrOpen extends PdfTok
  case object PdfArrClose extends PdfTok
  case class PdfOther(v: String) extends PdfTok

  /** Inflate a FlateDecode stream body (ISO-8859-1-roundtripped bytes). */
  private def inflate(body: Array[Byte]): Option[String] = {
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(body)
      val out = new java.io.ByteArrayOutputStream(body.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // needsDictionary would loop forever (n==0, needsInput false)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        out.write(buf, 0, n)
      }
      inf.end()
      Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1))
    } catch { case _: java.util.zip.DataFormatException => None }
  }

  /** All content streams in document order (object scan; uncompressed or
    * FlateDecode). */
  def contentStreams(pdf: Array[Byte]): List[String] = {
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = List.newBuilder[String]
    var from = 0
    while (true) {
      val start = s.indexOf("stream", from)
      if (start < 0) return out.result()
      // the object dict precedes the `stream` keyword; check for FlateDecode
      val dictStart = math.max(s.lastIndexOf("obj", start), from)
      val dict = s.substring(dictStart, start)
      val flate = dict.contains("/FlateDecode")
      val lengthM = java.util.regex.Pattern.compile("/Length\\s+(\\d+)").matcher(dict)
      val declaredLen = if (lengthM.find()) Some(lengthM.group(1).toInt) else None
      var body = start + "stream".length
      if (body < s.length && s.charAt(body) == '\r') body += 1
      if (body < s.length && s.charAt(body) == '\n') body += 1
      // prefer the declared length: compressed payloads may contain the
      // literal bytes "endstream"
      val end = declaredLen.map(l => math.min(body + l, s.length))
        .getOrElse(s.indexOf("endstream", body))
      if (end < 0) return out.result()
      val raw = s.substring(body, end)
      if (flate) {
        // pass bytes unstripped: trailing EOLs before `endstream` are ignored
        // by the inflater, while stripping could eat legit 0x0A/0x0D deflate
        // bytes at the end of the compressed payload
        val bytes = raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        inflate(bytes).foreach(out += _)
      } else out += raw
      val close = s.indexOf("endstream", end)
      from = (if (close >= 0) close else end) + "endstream".length
    }
    out.result()
  }

  /** A glyph plus the font size it was shown at (for layout/heading
    * classification). */
  case class SizedGlyph(glyph: Glyph, fontSize: Double)

  /** Interpret one content stream into glyphs (page-local, PDF bottom-left
    * coords flipped to top-left using pageHeight). */
  def interpret(stream: String, pageHeight: Double): Seq[Glyph] =
    interpretSized(stream, pageHeight).map(_.glyph)

  /** Like interpret, but keeps the active font size per glyph. */
  def interpretSized(stream: String, pageHeight: Double): Seq[SizedGlyph] = {
    val glyphs = mutable.ArrayBuffer.empty[SizedGlyph]
    val lex = new Lexer(stream)
    var fontSize = 12.0
    var leading = 0.0
    var x = 0.0; var y = 0.0          // current text position
    var lineX = 0.0; var lineY = 0.0  // start-of-line position
    val stack = mutable.ArrayBuffer.empty[PdfTok]
    var inArray = false
    val arrayItems = mutable.ArrayBuffer.empty[PdfTok]

    def showText(text: String): Unit = {
      for (ch <- text) {
        val w = advance(ch) / 1000.0 * fontSize
        val h = fontSize
        if (ch == ' ') {
          // spaces advance the pen without a glyph; the 2-means gap
          // clustering downstream recovers the word breaks
          x += w
        } else {
          // flip to top-left origin; glyph box spans the line height
          glyphs += SizedGlyph(Glyph(ch.toString, x, pageHeight - (y + h * 0.8), x + w,
            pageHeight - (y - h * 0.2)), fontSize)
          x += w
        }
      }
    }

    var tok = lex.next()
    while (tok.nonEmpty) {
      tok.get match {
        case PdfArrOpen => inArray = true; arrayItems.clear()
        case PdfArrClose => inArray = false
        case t @ (PdfNum(_) | PdfStr(_) | PdfName(_)) =>
          if (inArray) arrayItems += t else stack += t
        case PdfOp(op) =>
          op match {
            case "Tf" =>
              stack.lastOption match {
                case Some(PdfNum(sz)) => fontSize = sz
                case _ =>
              }
            case "TL" =>
              stack.lastOption match {
                case Some(PdfNum(l)) => leading = l
                case _ =>
              }
            case "Td" | "TD" =>
              (stack.takeRight(2).toList: @unchecked) match {
                case List(PdfNum(tx), PdfNum(ty)) =>
                  lineX += tx; lineY += ty
                  x = lineX; y = lineY
                  if (op == "TD") leading = -ty
                case _ =>
              }
            case "Tm" =>
              (stack.takeRight(6).toList: @unchecked) match {
                case List(PdfNum(_), PdfNum(_), PdfNum(_), PdfNum(_), PdfNum(e), PdfNum(f)) =>
                  lineX = e; lineY = f; x = e; y = f
                case _ =>
              }
            case "T*" =>
              lineY -= leading; x = lineX; y = lineY
            case "Tj" =>
              stack.lastOption match {
                case Some(PdfStr(t)) => showText(t)
                case _ =>
              }
            case "'" =>
              lineY -= leading; x = lineX; y = lineY
              stack.lastOption match {
                case Some(PdfStr(t)) => showText(t)
                case _ =>
              }
            case "TJ" =>
              for (item <- arrayItems) item match {
                case PdfStr(t) => showText(t)
                case PdfNum(adj) => x -= adj / 1000.0 * fontSize
                case _ =>
              }
              arrayItems.clear()
            case "BT" => lineX = 0; lineY = 0; x = 0; y = 0
            case "ET" | _ => // ignore others (colors, graphics state)
          }
          stack.clear()
        case _ =>
      }
      tok = lex.next()
    }
    glyphs.toSeq
  }

  /** Per-page glyphs for a whole PDF. */
  def extractGlyphs(pdf: Array[Byte], pageHeight: Double = 792.0): Map[Int, Seq[Glyph]] =
    contentStreams(pdf).zipWithIndex.map { case (cs, idx) =>
      (idx + 1) -> interpret(cs, pageHeight)
    }.toMap

  /** Text per page via the reconstruction kernel (lines by y-center
    * clustering, word gaps by 2-means). */
  def extractText(pdf: Array[Byte], pageHeight: Double = 792.0): Map[Int, String] =
    extractGlyphs(pdf, pageHeight).map { case (p, gs) =>
      p -> graft.textkit.SpacingRepair.reconstructFromChars(gs)
    }
}

/** Minimal deterministic PDF writer for the synthetic corpus: one content
  * stream per page, uncompressed, Helvetica, explicit Td line positioning.
  * `spreadLetters` emits a TJ array with negative kerning between letters —
  * the split-letter artifact the spacing-repair battery targets. */
object SyntheticPdf {
  def pdfFor(pages: Seq[Seq[String]], spreadLetterLine: Option[(Int, Int)] = None): Array[Byte] = {
    val objs = mutable.ArrayBuffer.empty[String]
    val pageObjIds = pages.indices.map(i => 4 + i * 2)
    objs += "<< /Type /Catalog /Pages 2 0 R >>" // 1
    objs += s"<< /Type /Pages /Kids [${pageObjIds.map(id => s"$id 0 R").mkString(" ")}] /Count ${pages.length} >>" // 2
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>" // 3
    for ((lines, pi) <- pages.zipWithIndex) {
      val content = new StringBuilder
      content ++= "BT /F1 12 Tf 72 720 Td 14 TL\n"
      for ((line, li) <- lines.zipWithIndex) {
        if (li > 0) content ++= "T*\n"
        val escaped = line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        if (spreadLetterLine.contains((pi + 1, li))) {
          // spread every letter with negative kerning: "(f)-280(i)-280(n)..."
          val parts = escaped.map(c => s"($c)").mkString(" -280 ")
          content ++= s"[$parts] TJ\n"
        } else {
          content ++= s"($escaped) Tj\n"
        }
      }
      content ++= "ET\n"
      val cs = content.result()
      objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${5 + pi * 2} 0 R " +
        "/Resources << /Font << /F1 3 0 R >> >> >>"
      objs += s"<< /Length ${cs.length} >>\nstream\n$cs\nendstream"
    }
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    val offsets = mutable.ArrayBuffer.empty[Int]
    for ((obj, idx) <- objs.zipWithIndex) {
      offsets += sb.length
      sb ++= s"${idx + 1} 0 obj\n$obj\nendobj\n"
    }
    val xrefPos = sb.length
    sb ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    for (off <- offsets) sb ++= f"$off%010d 00000 n \n"
    sb ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n"
    sb.result().getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def deflate(raw: String): String = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** PDF 1.5 writer: the SAME page content as [[pdfFor]] but the modern
    * file structure every current producer emits — dictionary objects
    * (catalog, page tree, font, page dicts) compressed inside a /Type
    * /ObjStm, Flate content streams, and offsets in a /Type /XRef
    * cross-reference STREAM with a PNG Up /DecodeParms predictor. No
    * classic `xref` table or `trailer` keyword anywhere. Drives the
    * reader's 1.5 path end-to-end under the DuckDB oracle (q55). */
  def pdfFor15(pages: Seq[Seq[String]]): Array[Byte] = {
    val n = pages.length
    def esc(t: String) = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    // dict objects 1..3+n live in the ObjStm; content streams are direct
    val contentIds = pages.indices.map(i => 4 + n + i)
    val objStmId = 4 + 2 * n
    val xrefId = objStmId + 1
    val dictObjs: Seq[(Int, String)] =
      Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [${(0 until n).map(i => s"${4 + i} 0 R").mkString(" ")}] /Count $n >>",
        3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") ++
        pages.indices.map { i =>
          (4 + i) -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Contents ${contentIds(i)} 0 R /Resources << /Font << /F1 3 0 R >> >> >>")
        }
    val bodies = dictObjs.map(_._2)
    val offs = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = dictObjs.map(_._1).zip(offs)
      .map { case (num, o) => s"$num $o" }.mkString(" ") + " "
    val objStmPayload = deflate(header + bodies.mkString("\n") + "\n")

    val sb = new StringBuilder("%PDF-1.5\n%âãÏÓ\n")
    val objPos = mutable.HashMap.empty[Int, Int]
    def emit(num: Int, body: String): Unit = {
      objPos(num) = sb.length
      sb ++= s"$num 0 obj\n$body\nendobj\n"
    }
    for ((lines, pi) <- pages.zipWithIndex) {
      val content = new StringBuilder
      content ++= "BT /F1 12 Tf 72 720 Td 14 TL\n"
      for ((line, li) <- lines.zipWithIndex) {
        if (li > 0) content ++= "T*\n"
        content ++= s"(${esc(line)}) Tj\n"
      }
      content ++= "ET\n"
      val packed = deflate(content.result())
      emit(contentIds(pi),
        s"<< /Length ${packed.length} /Filter /FlateDecode >>\nstream\n$packed\nendstream")
    }
    emit(objStmId, s"<< /Type /ObjStm /N ${dictObjs.length} /First ${header.length} " +
      s"/Filter /FlateDecode /Length ${objStmPayload.length} >>\nstream\n$objStmPayload\nendstream")
    // xref stream: W [1 4 2], rows 0..xrefId, PNG Up predictor over 7-byte rows
    val xrefPos = sb.length
    val rowLen = 7
    def row(t: Int, f2: Long, f3: Int): Array[Byte] = Array(
      t.toByte, ((f2 >> 24) & 0xFF).toByte, ((f2 >> 16) & 0xFF).toByte,
      ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte,
      ((f3 >> 8) & 0xFF).toByte, (f3 & 0xFF).toByte)
    val rows: Seq[Array[Byte]] =
      Seq(row(0, 0, 0xFFFF)) ++
        dictObjs.zipWithIndex.map { case ((num, _), k) => row(2, objStmId, k) } ++
        contentIds.map(id => row(1, objPos(id), 0)) ++
        Seq(row(1, objPos(objStmId), 0), row(1, xrefPos, 0))
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](rowLen)
    for (r <- rows) {
      filtered.write(2) // PNG Up
      var i = 0
      while (i < rowLen) { filtered.write(((r(i) & 0xFF) - (prev(i) & 0xFF)) & 0xFF); i += 1 }
      prev = r
    }
    val packedXref = deflate(new String(filtered.toByteArray,
      java.nio.charset.StandardCharsets.ISO_8859_1))
    sb ++= s"$xrefId 0 obj\n<< /Type /XRef /Size ${xrefId + 1} /W [ 1 4 2 ] /Root 1 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $rowLen >> " +
      s"/Length ${packedXref.length} >>\nstream\n$packedXref\nendstream\nendobj\n"
    sb ++= s"startxref\n$xrefPos\n%%EOF\n"
    sb.result().getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Encrypted classic-structure PDF (q59): the SAME page content as
    * [[pdfFor]] but with every content stream encrypted by the standard
    * security handler — empty user password, owner password "owner".
    * `cipher` selects the handler generation a real corpus mixes:
    * "rc4" = V2/R3 RC4-128, "aesv2" = V4/R4 AES-128, "aesv3" = V5/R6
    * AES-256 (Algorithm 2.B). `seed` derives the /ID and IVs
    * deterministically so the oracle's closed forms are stable. */
  def pdfForEncrypted(pages: Seq[Seq[String]], cipher: String, seed: Long): Array[Byte] = {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val fileId: Array[Byte] =
      (0 until 16).map(k => ((seed >> (k % 8 * 8)) ^ (k * 37)).toByte).toArray
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02X").mkString
    def ivFor(objNum: Int): Array[Byte] =
      (0 until 16).map(k => ((seed * 31 + objNum * 7 + k) & 0xFF).toByte).toArray

    // handler setup + per-object stream encryptor
    val p = -3904
    val ownerPwd = "owner".getBytes(ISO_8859_1)
    val (encDict, encryptStream): (String, (Int, Array[Byte]) => Array[Byte]) =
      cipher match {
        case "rc4" =>
          val o = PdfCrypt.computeOwnerEntry(ownerPwd, Array.empty, 16)
          val fileKey = PdfCrypt.fileKeyR234(o, p, fileId, 128, r = 3,
            encryptMetadata = true)
          val u = PdfCrypt.computeUserEntryR34(fileKey, fileId)
          (s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p " +
            s"/O <${hex(o)}> /U <${hex(u)}> >>",
            (num: Int, plain: Array[Byte]) =>
              PdfCrypt.rc4(PdfCrypt.objectKey(fileKey, num, 0, aes = false), plain))
        case "aesv2" =>
          val o = PdfCrypt.computeOwnerEntry(ownerPwd, Array.empty, 16)
          val fileKey = PdfCrypt.fileKeyR234(o, p, fileId, 128, r = 4,
            encryptMetadata = true)
          val u = PdfCrypt.computeUserEntryR34(fileKey, fileId)
          (s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p " +
            s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF " +
            s"/StrF /StdCF /O <${hex(o)}> /U <${hex(u)}> >>",
            (num: Int, plain: Array[Byte]) => {
              val iv = ivFor(num)
              iv ++ PdfCrypt.aesCbcEncrypt(
                PdfCrypt.objectKey(fileKey, num, 0, aes = true), iv, plain, pad = true)
            })
        case _ => // aesv3
          val fileKey = (0 until 32).map(k => ((seed * 13 + k * 41) & 0xFF).toByte).toArray
          val vSalt = (0 until 8).map(k => ((seed + k) & 0xFF).toByte).toArray
          val kSalt = (0 until 8).map(k => ((seed * 7 + k) & 0xFF).toByte).toArray
          val u = PdfCrypt.hash2B(Array.empty, vSalt, Array.empty, r = 6) ++ vSalt ++ kSalt
          val ue = PdfCrypt.aesCbcEncrypt(
            PdfCrypt.hash2B(Array.empty, kSalt, Array.empty, r = 6),
            new Array[Byte](16), fileKey, pad = false)
          (s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $p " +
            s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF " +
            s"/StrF /StdCF /O <${hex(new Array[Byte](48))}> /U <${hex(u)}> " +
            s"/OE <${hex(new Array[Byte](32))}> /UE <${hex(ue)}> >>",
            (num: Int, plain: Array[Byte]) => {
              val iv = ivFor(num)
              iv ++ PdfCrypt.aesCbcEncrypt(fileKey, iv, plain, pad = true)
            })
      }

    val objs = mutable.ArrayBuffer.empty[String]
    objs += "<< /Type /Catalog /Pages 2 0 R >>" // 1
    objs += s"<< /Type /Pages /Kids [${pages.indices.map(i => s"${4 + i * 2} 0 R").mkString(" ")}] /Count ${pages.length} >>" // 2
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>" // 3
    for ((lines, pi) <- pages.zipWithIndex) {
      val content = new StringBuilder
      content ++= "BT /F1 12 Tf 72 720 Td 14 TL\n"
      for ((line, li) <- lines.zipWithIndex) {
        if (li > 0) content ++= "T*\n"
        val escaped = line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        content ++= s"($escaped) Tj\n"
      }
      content ++= "ET\n"
      val streamObjNum = 5 + pi * 2
      val enc = encryptStream(streamObjNum, content.result().getBytes(ISO_8859_1))
      objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $streamObjNum 0 R " +
        "/Resources << /Font << /F1 3 0 R >> >> >>"
      objs += s"<< /Length ${enc.length} >>\nstream\n" +
        new String(enc, ISO_8859_1) + "\nendstream"
    }
    objs += encDict // last object
    val sb = new StringBuilder
    sb ++= "%PDF-1.6\n"
    val offsets = mutable.ArrayBuffer.empty[Int]
    for ((obj, idx) <- objs.zipWithIndex) {
      offsets += sb.length
      sb ++= s"${idx + 1} 0 obj\n$obj\nendobj\n"
    }
    val xrefPos = sb.length
    sb ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    for (off <- offsets) sb ++= f"$off%010d 00000 n \n"
    sb ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R " +
      s"/Encrypt ${objs.length} 0 R /ID [ <${hex(fileId)}> <${hex(fileId)}> ] >>" +
      s"\nstartxref\n$xrefPos\n%%EOF\n"
    sb.result().getBytes(ISO_8859_1)
  }

  /** One laid-out line: text, font size, vertical gap from previous line.
    * When `cells` is non-empty the line is a table row: (columnX, text)
    * pairs positioned with relative Td moves. */
  case class SizedLine(text: String, size: Double, gapBefore: Double,
                       cells: Seq[(Double, String)] = Nil)

  /** Multi-size writer with optional FlateDecode compression. */
  def pdfSized(pages: Seq[Seq[SizedLine]], compress: Boolean = false): Array[Byte] = {
    val objs = mutable.ArrayBuffer.empty[String]
    val pageObjIds = pages.indices.map(i => 4 + i * 2)
    objs += "<< /Type /Catalog /Pages 2 0 R >>"
    objs += s"<< /Type /Pages /Kids [${pageObjIds.map(id => s"$id 0 R").mkString(" ")}] /Count ${pages.length} >>"
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for ((lines, pi) <- pages.zipWithIndex) {
      val content = new StringBuilder
      content ++= "BT 72 720 Td\n"
      var lastSize = -1.0
      def esc(t: String) = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      for (line <- lines) {
        if (line.size != lastSize) { content ++= s"/F1 ${line.size} Tf\n"; lastSize = line.size }
        if (line.gapBefore != 0) content ++= s"0 -${line.gapBefore} Td\n"
        if (line.cells.isEmpty) {
          content ++= s"(${esc(line.text)}) Tj\n"
        } else {
          // table row: walk columns with relative moves, then restore x
          val base = 72.0
          var cx = base
          for ((x, text) <- line.cells) {
            val dx = x - cx
            if (dx != 0) content ++= s"$dx 0 Td\n"
            content ++= s"(${esc(text)}) Tj\n"
            cx = x
          }
          if (cx != base) content ++= s"${base - cx} 0 Td\n"
        }
      }
      content ++= "ET\n"
      val cs = content.result()
      objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${5 + pi * 2} 0 R " +
        "/Resources << /Font << /F1 3 0 R >> >> >>"
      if (compress) {
        val deflater = new java.util.zip.Deflater()
        val raw = cs.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        deflater.setInput(raw); deflater.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
        deflater.end()
        val packed = new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
        objs += s"<< /Length ${packed.length} /Filter /FlateDecode >>\nstream\n$packed\nendstream"
      } else {
        objs += s"<< /Length ${cs.length} >>\nstream\n$cs\nendstream"
      }
    }
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    val offsets = mutable.ArrayBuffer.empty[Int]
    for ((obj, idx2) <- objs.zipWithIndex) {
      offsets += sb.length
      sb ++= s"${idx2 + 1} 0 obj\n$obj\nendobj\n"
    }
    val xrefPos = sb.length
    sb ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    for (off <- offsets) sb ++= f"$off%010d 00000 n \n"
    sb ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n"
    sb.result().getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
