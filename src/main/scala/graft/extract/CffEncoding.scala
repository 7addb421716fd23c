package graft.extract

/** Minimal CFF (Compact Font Format — the /FontFile3 "Type1C" program)
  * reader: just enough to recover the font's BUILT-IN code -> glyph-name
  * encoding when the PDF font dict declares no /Encoding. Parses the
  * header, the four leading INDEX structures, the Top DICT's charset/
  * Encoding/CharStrings offsets, then maps code -> GID (Encoding formats
  * 0/1, or the Standard predefined encoding) -> SID (charset formats
  * 0/1/2) -> name (standard strings SID < 391, else the String INDEX).
  *
  * Layout per the public CFF spec (Adobe TN #5176); corrupt data returns
  * None, never throws (PdfRobustnessSpec contract). Rendering data
  * (CharStrings, subrs, private dict) is deliberately not touched.
  */
object CffEncoding {
  /** SIDs 0..228 (the ISOAdobe set) from the spec's Standard Strings. */
  private val StandardStrings: Array[String] = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand " +
    "quoteright parenleft parenright asterisk plus comma hyphen period " +
    "slash zero one two three four five six seven eight nine colon " +
    "semicolon less equal greater question at A B C D E F G H I J K L M " +
    "N O P Q R S T U V W X Y Z bracketleft backslash bracketright " +
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q " +
    "r s t u v w x y z braceleft bar braceright asciitilde exclamdown " +
    "cent sterling fraction yen florin section currency quotesingle " +
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl " +
    "endash dagger daggerdbl periodcentered paragraph bullet " +
    "quotesinglbase quotedblbase quotedblright guillemotright ellipsis " +
    "perthousand questiondown grave acute circumflex tilde macron breve " +
    "dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash " +
    "AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash " +
    "oslash oe germandbls onesuperior logicalnot mu trademark Eth " +
    "onehalf plusminus Thorn onequarter divide brokenbar degree thorn " +
    "threequarters twosuperior registered minus eth multiply " +
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring " +
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute " +
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis " +
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute " +
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde " +
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex " +
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde " +
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron"
  ).split(" ")

  private final class Reader(val d: Array[Byte]) {
    def u8(i: Int): Int = d(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def off(i: Int, sz: Int): Int = {
      var v = 0; var k = 0
      while (k < sz) { v = (v << 8) | u8(i + k); k += 1 }
      v
    }
  }

  /** (entries, byte position after the INDEX). Entries as (start, end). */
  private def index(r: Reader, at: Int): Option[(Vector[(Int, Int)], Int)] = {
    if (at + 2 > r.d.length) return None
    val count = r.u16(at)
    if (count == 0) return Some((Vector.empty, at + 2))
    val offSize = r.u8(at + 2)
    if (offSize < 1 || offSize > 4) return None
    val offArr = at + 3
    val dataStart = offArr + (count + 1) * offSize - 1
    if (dataStart >= r.d.length) return None
    val offs = (0 to count).map(k => r.off(offArr + k * offSize, offSize))
    if (offs.exists(o => o < 1 || dataStart + o > r.d.length)) return None
    val entries = (0 until count).map(k =>
      (dataStart + offs(k), dataStart + offs(k + 1))).toVector
    Some((entries, dataStart + offs(count)))
  }

  /** Top DICT integer operands for charset(15)/Encoding(16)/CharStrings(17). */
  private def topDictOffsets(r: Reader, from: Int, to: Int): Map[Int, Int] = {
    val out = scala.collection.mutable.HashMap.empty[Int, Int]
    val operands = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = from
    while (i < to) {
      val b0 = r.u8(i)
      if (b0 <= 21) { // operator
        val op = if (b0 == 12) { i += 1; 1200 + r.u8(i) } else b0
        if ((op == 15 || op == 16 || op == 17) && operands.nonEmpty)
          out(op) = operands.last
        operands.clear(); i += 1
      } else if (b0 >= 32 && b0 <= 246) { operands += b0 - 139; i += 1 }
      else if (b0 >= 247 && b0 <= 250) {
        operands += (b0 - 247) * 256 + r.u8(i + 1) + 108; i += 2
      } else if (b0 >= 251 && b0 <= 254) {
        operands += -(b0 - 251) * 256 - r.u8(i + 1) - 108; i += 2
      } else if (b0 == 28) { operands += r.u16(i + 1).toShort.toInt; i += 3 }
      else if (b0 == 29) { operands += r.off(i + 1, 4); i += 5 }
      else if (b0 == 30) { // real number: skip nibbles to 0xf terminator
        i += 1
        var done = false
        while (!done && i < to) {
          val b = r.u8(i); i += 1
          if ((b & 0x0F) == 0x0F || (b >> 4) == 0x0F) done = true
        }
        operands += 0
      } else i += 1 // reserved: skip
    }
    out.toMap
  }

  /** code -> glyph name (256 entries, "" = unmapped), or None if this is
    * not parseable CFF. */
  def builtinEncoding(bytes: Array[Byte]): Option[Array[String]] = {
    try {
      val r = new Reader(bytes)
      if (bytes.length < 4 || r.u8(0) != 1) return None // major version 1
      val hdrSize = r.u8(2)
      val (_, afterNames) = index(r, hdrSize).getOrElse(return None)
      val (topDicts, afterTop) = index(r, afterNames).getOrElse(return None)
      if (topDicts.isEmpty) return None
      val (strings, _) = index(r, afterTop).getOrElse(return None)
      val dict = topDictOffsets(r, topDicts.head._1, topDicts.head._2)
      val charStringsOff = dict.getOrElse(17, return None)
      val nGlyphs = {
        if (charStringsOff + 2 > bytes.length) return None
        r.u16(charStringsOff)
      }
      def sidName(sid: Int): String =
        if (sid >= 0 && sid < StandardStrings.length) StandardStrings(sid)
        else if (sid >= 391 && sid - 391 < strings.length) {
          val (s0, s1) = strings(sid - 391)
          new String(bytes, s0, s1 - s0, java.nio.charset.StandardCharsets.ISO_8859_1)
        } else ""
      // charset: GID -> SID (GID 0 = .notdef). Offset 0 = ISOAdobe
      // (identity SIDs), 1/2 = Expert (unsupported -> identity).
      val gidToSid: Int => Int = dict.get(15) match {
        case None | Some(0) | Some(1) | Some(2) => gid => gid
        case Some(cs) =>
          val arr = new Array[Int](nGlyphs)
          val fmt = r.u8(cs)
          if (fmt == 0) {
            var g = 1
            while (g < nGlyphs && cs + 1 + (g - 1) * 2 + 1 < bytes.length) {
              arr(g) = r.u16(cs + 1 + (g - 1) * 2); g += 1
            }
          } else if (fmt == 1 || fmt == 2) {
            val leftSize = if (fmt == 1) 1 else 2
            var g = 1
            var i = cs + 1
            while (g < nGlyphs && i + 2 + leftSize <= bytes.length) {
              val first = r.u16(i)
              val nLeft = if (fmt == 1) r.u8(i + 2) else r.u16(i + 2)
              var k = 0
              while (k <= nLeft && g < nGlyphs) { arr(g) = first + k; g += 1; k += 1 }
              i += 2 + leftSize
            }
          }
          gid => if (gid >= 0 && gid < nGlyphs) arr(gid) else 0
      }
      // Encoding: code -> GID. Offsets 0/1 are the predefined Standard/
      // Expert encodings (caller falls back to its Standard table).
      val encOff = dict.getOrElse(16, 0)
      if (encOff <= 1) return None
      val table = Array.fill(256)("")
      val fmt = r.u8(encOff) & 0x7F
      if (fmt == 0) {
        val nCodes = r.u8(encOff + 1)
        var k = 1
        while (k <= nCodes && encOff + 1 + k < bytes.length) {
          val code = r.u8(encOff + 1 + k)
          table(code) = sidName(gidToSid(k)) // GID k encodes code
          k += 1
        }
      } else if (fmt == 1) {
        val nRanges = r.u8(encOff + 1)
        var gid = 1
        var i = encOff + 2
        var rge = 0
        while (rge < nRanges && i + 1 < bytes.length) {
          val first = r.u8(i); val nLeft = r.u8(i + 1)
          var k = 0
          while (k <= nLeft) {
            val code = first + k
            if (code < 256) table(code) = sidName(gidToSid(gid))
            gid += 1; k += 1
          }
          i += 2; rge += 1
        }
      } else return None
      if (table.exists(_.nonEmpty)) Some(table) else None
    } catch { case _: Exception => None }
  }

  /** Test access to the standard strings (ordering pins). */
  private[extract] def standardStringsForTest: Array[String] = StandardStrings
}
