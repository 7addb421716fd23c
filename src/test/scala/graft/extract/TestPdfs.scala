package graft.extract

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Shared hand-assembled PDF fixtures. */
object TestPdfs {
  /** PDF 1.5 file with NO classic xref/trailer: a /Type /XRef stream
    * (Flate + PNG Up predictor) carries the offsets and /Root. Object 4 has
    * a stale decoy definition LATER in the file that the raw scan would
    * prefer (later-wins); the xref stream points at the live first one. The
    * font lives compressed in an ObjStm routed by a type-2 entry. */
  def buildXrefStreamPdf(): Array[Byte] = {
    val content = "BT /F1 12 Tf 10 150 Td (CURRENT) Tj ET"
    val stale = "BT /F1 12 Tf 10 150 Td (STALE) Tj ET"
    val fontObj = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val objStmHeader = "5 0 "
    val objStmData = objStmHeader + fontObj
    val sb = new StringBuilder("%PDF-1.5\n%âãÏÓ\n")
    val off = scala.collection.mutable.HashMap.empty[Int, Int]
    def obj(n: Int, body: String): Unit = {
      off(n) = sb.length
      sb ++= s"$n 0 obj\n$body\nendobj\n"
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 300 200 ] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    // ObjStm holding the font (object 5) compressed
    val packedStm = {
      val d = new java.util.zip.Deflater()
      d.setInput(objStmData.getBytes(ISO_8859_1)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      new String(out.toByteArray, ISO_8859_1)
    }
    obj(7, s"<< /Type /ObjStm /N 1 /First ${objStmHeader.length} " +
      s"/Filter /FlateDecode /Length ${packedStm.length} >>\nstream\n$packedStm\nendstream")
    // stale decoy AFTER the live object 4 — unreferenced by the xref stream
    sb ++= s"4 0 obj\n<< /Length ${stale.length} >>\nstream\n$stale\nendstream\nendobj\n"
    // xref stream: W [1 4 2], rows for objects 0..7, PNG Up predictor
    val xrefPos = sb.length
    val rowLen = 7
    def row(t: Int, f2: Long, f3: Int): Array[Byte] = Array(
      t.toByte, ((f2 >> 24) & 0xFF).toByte, ((f2 >> 16) & 0xFF).toByte,
      ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte,
      ((f3 >> 8) & 0xFF).toByte, (f3 & 0xFF).toByte)
    val rows = Array(
      row(0, 0, 0xFFFF),                    // 0: free
      row(1, off(1), 0), row(1, off(2), 0), row(1, off(3), 0),
      row(1, off(4), 0),                    // 4 -> the LIVE first definition
      row(2, 7, 0),                         // 5: in ObjStm 7, index 0
      row(1, xrefPos, 0),                   // 6: this xref stream
      row(1, off(7), 0))
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](rowLen)
    for (r <- rows) {
      filtered.write(2) // PNG Up
      for (i <- 0 until rowLen) filtered.write(((r(i) & 0xFF) - (prev(i) & 0xFF)) & 0xFF)
      prev = r
    }
    val packedXref = {
      val d = new java.util.zip.Deflater()
      d.setInput(filtered.toByteArray); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      new String(out.toByteArray, ISO_8859_1)
    }
    sb ++= s"6 0 obj\n<< /Type /XRef /Size 8 /W [ 1 4 2 ] /Root 1 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $rowLen >> " +
      s"/Length ${packedXref.length} >>\nstream\n$packedXref\nendstream\nendobj\n"
    sb ++= s"startxref\n$xrefPos\n%%EOF\n"
    sb.result().getBytes(ISO_8859_1)
  }

  def buildCff(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int*): Unit = v.foreach(x => out.write(x & 0xFF))
    def str(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    b(1, 0, 4, 1)                     // header
    b(0, 1, 1, 1, 5); str("Test")     // Name INDEX
    val topDictIndexPos = out.size()
    val dictLen = 18                  // 3 x (5-byte int32 operand + 1-byte op)
    b(0, 1, 1, 1, dictLen + 1)        // Top DICT INDEX header
    val dictPos = out.size()
    // operand placeholders patched below
    b(29, 0, 0, 0, 0, 15)             // charset
    b(29, 0, 0, 0, 0, 16)             // Encoding
    b(29, 0, 0, 0, 0, 17)             // CharStrings
    assert(out.size() - dictPos == dictLen)
    b(0, 1, 1, 1, 7); str("abreve")   // String INDEX
    b(0, 0)                           // Global Subr INDEX (empty)
    val charsetPos = out.size()
    b(0, 391 >> 8, 391 & 0xFF, 0, 34) // charset fmt0: GID1=abreve GID2=A
    val encodingPos = out.size()
    b(0, 2, 65, 66)                   // encoding fmt0: 2 codes
    val charStringsPos = out.size()
    b(0, 3, 1, 1, 2, 3, 4, 14, 14, 14) // 3 x endchar
    val bytes = out.toByteArray
    def patch(at: Int, v: Int): Unit = {
      bytes(at + 1) = ((v >> 24) & 0xFF).toByte
      bytes(at + 2) = ((v >> 16) & 0xFF).toByte
      bytes(at + 3) = ((v >> 8) & 0xFF).toByte
      bytes(at + 4) = (v & 0xFF).toByte
    }
    patch(dictPos, charsetPos)
    patch(dictPos + 6, encodingPos)
    patch(dictPos + 12, charStringsPos)
    locally { val _ = topDictIndexPos }
    bytes
  }
}
