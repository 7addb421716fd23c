package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: run the REAL long_report.pdf through the full extractOne
  * pipeline (PdfDoc glyphs -> PdfLayout blocks/tables -> transforms ->
  * markdown) — the reference CLI's primary use case, with no docling JSON. */
object RealPdfProbe {
  def main(args: Array[String]): Unit = {
    val pdf = Files.readAllBytes(Paths.get("/root/reference/examples/long_report.pdf"))
    val t0 = System.nanoTime()
    val row = graft.extract.Pipeline.extractOne("doc://long_report", pdf, "ro", 0)
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"pages=${row.page_count} items=${row.item_count} tables=${row.table_count} " +
      f"md_chars=${row.md_chars} spacing_fixed=${row.spacing_fixed} ${ms}%.0f ms")
    Files.writeString(Paths.get("/tmp/real_pdf.md"), row.markdown)
    println("markdown -> /tmp/real_pdf.md")
  }
}
