package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: dump glyphs of a page within a bbox region (top-left coords).
  * Usage: runMain graft.tools.GlyphRegion <page> <l> <t> <r> <b> */
object GlyphRegion {
  def main(args: Array[String]): Unit = {
    val pdf = Files.readAllBytes(Paths.get("/root/reference/examples/long_report.pdf"))
    val page = args(0).toInt
    val Array(l, t, r, b) = args.slice(1, 5).map(_.toDouble)
    val glyphs = graft.extract.PdfDoc.extractGlyphs(pdf).getOrElse(page, Seq.empty)
    glyphs.filter { g =>
      val cx = (g.x0 + g.x1) / 2; val cy = (g.y0 + g.y1) / 2
      cx >= l && cx <= r && cy >= t && cy <= b
    }.sortBy(g => (g.y0, g.x0)).foreach { g =>
      println(f"'${g.c}' x=${g.x0}%.1f..${g.x1}%.1f y=${g.y0}%.1f..${g.y1}%.1f")
    }
  }
}
