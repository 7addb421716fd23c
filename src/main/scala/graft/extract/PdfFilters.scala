package graft.extract

import java.io.ByteArrayOutputStream

/** Legacy PDF stream filters (ISO 32000-1 §7.4) beyond FlateDecode: LZW,
  * RunLength, ASCIIHex, ASCII85. The reference inherits these from PyMuPDF
  * (pymupdf_spacing_fix.py:365-513 delegates all stream decoding); older
  * producers (pre-2000 Acrobat, some TeX toolchains) still emit them.
  *
  * All decoders share the PdfRobustnessSpec contract: corrupt or truncated
  * input degrades to the bytes decoded so far (or None only when the filter
  * tag itself is wrong) — never throws, never loops unbounded.
  */
object PdfFilters {
  /** LZWDecode (§7.4.4): MSB-first variable-width codes 9→12 bits, clear
    * code 256, EOD 257. `earlyChange=1` (the default) bumps the code width
    * one code early, matching every mainstream encoder. */
  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, data.length * 3))
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var dictSize = 258
    var codeWidth = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var done = false
    while (!done) {
      while (bitCnt < codeWidth && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xFF); bitCnt += 8; pos += 1
      }
      if (bitCnt < codeWidth) done = true // truncated stream: degrade
      else {
        val code = ((bitBuf >> (bitCnt - codeWidth)) & ((1L << codeWidth) - 1)).toInt
        bitCnt -= codeWidth
        if (code == 256) { dictSize = 258; codeWidth = 9; prev = null }
        else if (code == 257) done = true // EOD
        else {
          val entry: Array[Byte] =
            if (code < dictSize && code < 4096 && dict(code) != null) dict(code)
            else if (code == dictSize && prev != null) prev :+ prev(0) // KwKwK
            else { done = true; null } // corrupt code: degrade
          if (entry != null) {
            out.write(entry, 0, entry.length)
            if (prev != null && dictSize < 4096) {
              dict(dictSize) = prev :+ entry(0); dictSize += 1
            }
            prev = entry
            if (dictSize + earlyChange >= (1 << codeWidth) && codeWidth < 12)
              codeWidth += 1
          }
        }
      }
    }
    out.toByteArray
  }

  /** RunLengthDecode (§7.4.5): length byte 0..127 copies L+1 literals,
    * 129..255 repeats the next byte 257-L times, 128 is EOD. */
  def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, data.length * 2))
    var pos = 0
    var done = false
    while (!done && pos < data.length) {
      val l = data(pos) & 0xFF
      pos += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = math.min(l + 1, data.length - pos)
        out.write(data, pos, n)
        pos += n
        if (n < l + 1) done = true // truncated: degrade
      } else {
        if (pos < data.length) {
          val b = data(pos); pos += 1
          var k = 0
          while (k < 257 - l) { out.write(b); k += 1 }
        } else done = true
      }
    }
    out.toByteArray
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>' is EOD;
    * an odd final digit is padded with 0. */
  def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var pos = 0
    var done = false
    def hexVal(c: Int): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (!done && pos < data.length) {
      val c = data(pos) & 0xFF
      pos += 1
      if (c == '>') done = true
      else {
        val v = hexVal(c)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        } // non-hex, non-ws bytes: skipped (degrade)
      }
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): 5 chars '!'..'u' per 4 bytes base-85, 'z' for
    * four zero bytes, '~>' EOD, partial final group of n chars yields n-1
    * bytes (decoded as if padded with 'u'). */
  def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var n = 0
    var pos = 0
    var done = false
    def flush(chars: Int): Unit = {
      // pad to 5 with 'u' (84) and emit chars-1 bytes
      var k = chars
      while (k < 5) { group(k) = 84; k += 1 }
      var v = 0L
      k = 0
      while (k < 5) { v = v * 85 + group(k); k += 1 }
      val bytes = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(bytes, 0, math.max(0, chars - 1))
    }
    while (!done && pos < data.length) {
      val c = data(pos) & 0xFF
      pos += 1
      if (c == '~') done = true // EOD marker (the '>' after is ignored)
      else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        group(n) = c - '!'
        n += 1
        if (n == 5) { flush(5); n = 0 }
      } // whitespace/garbage: skipped (degrade)
    }
    if (n > 1) flush(n) // a single trailing char is invalid: dropped
    out.toByteArray
  }
}
