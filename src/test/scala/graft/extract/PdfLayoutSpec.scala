package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.sources.SyntheticPdfPages

class PdfLayoutSpec extends AnyFunSuite {
  test("layout parse recovers the content plan structurally (40 docs)") {
    for (i <- 0L until 40L) {
      val (pdf, expected) = SyntheticPdfPages.pdfDoc(42L, i)
      val doc = PdfLayout.buildDoc(expected.url, pdf)
      val got = doc.items.map(it => (it.label, it.pageNo, it.text)).toList
      val want = expected.items.map(it => (it.label, it.pageNo, it.text)).toList
      assert(got == want, s"doc $i\ngot:  ${got.take(6)}\nwant: ${want.take(6)}")
      // table items: full cell grids must match
      for ((g, w) <- doc.items.zip(expected.items) if w.table.nonEmpty) {
        val gt = g.table.getOrElse(fail(s"doc $i: expected a table item"))
        val wt = w.table.get
        assert(gt.numRows == wt.numRows && gt.numCols == wt.numCols, s"doc $i table shape")
        assert(gt.cells.map(c => (c.startRow, c.startCol, c.text)).toList ==
          wt.cells.map(c => (c.startRow, c.startCol, c.text)).toList, s"doc $i table cells")
      }
      assert(doc.pages.map(_.pageNo).toList == expected.pages.map(_.pageNo).toList)
    }
  }

  test("compressed (FlateDecode) and uncompressed payloads parse identically") {
    val (pdfU, expected) = SyntheticPdfPages.pdfDoc(42L, 2L) // even: uncompressed
    val (pdfC, _) = SyntheticPdfPages.pdfDoc(42L, 3L)        // odd: compressed
    assert(new String(pdfC.take(600).map(_.toChar)).contains("FlateDecode"))
    assert(PdfLayout.buildDoc("u", pdfU).items.nonEmpty)
    assert(PdfLayout.buildDoc("u", pdfC).items.nonEmpty)
  }

  test("pipeline routes PDF payloads end-to-end to markdown") {
    val (pdf, expected) = SyntheticPdfPages.pdfDoc(42L, 5L)
    val row = Pipeline.extractOne(expected.url, pdf, "ro", 0)
    // same expectation path as the HTML corpus: transforms+render over the plan
    val (clean, _) = DocTransforms.applyAll(expected.copy(
      items = PdfLayout.buildDoc(expected.url, pdf).items,
      pages = PdfLayout.buildDoc(expected.url, pdf).pages))
    val expectedMd = MarkdownRender.postProcess(MarkdownRender.render(clean))
    assert(row.markdown == expectedMd)
    assert(row.markdown.contains("# Raport anual"))
    assert(row.markdown.contains("## "))
    assert(row.page_count == expected.pages.length)
  }

  test("two stacked tables with coincident columns stay separate items") {
    import graft.extract.SyntheticPdf.SizedLine
    val colX = Seq(72.0, 250.0, 400.0)
    def row(a: String, b: String, c: String, gap: Double) =
      SizedLine("", 12, gap, cells = colX.zip(Seq(a, b, c)))
    val lines = Seq(
      row("Indicatori", "30/09/2025", "Delta", 0),
      row("PROFIT NET", "RON 471.371", "24,66%", 16),
      row("CIFRA", "EUR 36.549.554", "78,5%", 16),
      // 60pt of whitespace: a second, separate table
      row("Indicatori", "30/09/2024", "Delta", 60),
      row("ACTIVE", "RON 158.065.856", "35,5%", 16))
    val pdf = graft.extract.SyntheticPdf.pdfSized(Seq(lines))
    val tables = PdfLayout.buildDoc("u", pdf).items.flatMap(_.table)
    assert(tables.length == 2, s"expected 2 tables, got ${tables.length}")
    assert(tables(0).numRows == 3 && tables(1).numRows == 2)
  }
}
