package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: parse a real PDF with PdfDoc and dump per-page reconstructed
  * text (lines via the 2-means kernel) for eyeballing font decode quality.
  * Usage: runMain graft.tools.PdfDocProbe [pdfPath] [pageNo]
  */
object PdfDocProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/root/reference/examples/long_report.pdf"
    val pdf = Files.readAllBytes(Paths.get(path))
    val only = if (args.length > 1) Some(args(1).toInt) else None
    val glyphs = graft.extract.PdfDoc.extractGlyphs(pdf)
    val sb = new StringBuilder
    sb ++= s"pages: ${glyphs.size}; glyph counts: " +
      glyphs.toSeq.sortBy(_._1).map { case (p, g) => s"$p:${g.length}" }.mkString(" ") + "\n"
    for ((p, gs) <- glyphs.toSeq.sortBy(_._1) if only.forall(_ == p)) {
      sb ++= s"\n===== page $p (${gs.length} glyphs)\n"
      sb ++= graft.textkit.SpacingRepair.reconstructFromChars(gs)
      sb ++= "\n"
    }
    Files.writeString(Paths.get("/tmp/pdfdoc_probe.txt"), sb.result())
    println(s"wrote /tmp/pdfdoc_probe.txt (${glyphs.values.map(_.length).sum} glyphs total)")
  }
}
