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

/** PDF table header structure: a spanning header row above an aligned band
  * (table_fixes.py:272-337 needs real spans for the collapse to do work). */
class PdfHeaderGroupSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.extract.SyntheticPdf.SizedLine
  import graft.model._

  private def tablePdf(): Array[Byte] = {
    // header: 3 runs; data rows: 5 aligned runs -> header runs span columns
    val header = SizedLine("", 12, 0, cells = Seq(
      (72.0, "Indicatori"), (200.0, "30/09/2025"), (360.0, "30/09/2024")))
    val rows = Seq(
      Seq((72.0, "CIFRA"), (200.0, "RON"), (260.0, "158.065.856"), (360.0, "RON"), (420.0, "126.792.531")),
      Seq((72.0, "VENITURI"), (200.0, "RON"), (260.0, "245.140.981"), (360.0, "RON"), (420.0, "193.492.036")),
      Seq((72.0, "PROFIT"), (200.0, "RON"), (260.0, "42.916.476"), (360.0, "RON"), (420.0, "21.077.699")))
      .map(cs => SizedLine("", 12, 14, cells = cs))
    graft.extract.SyntheticPdf.pdfSized(Seq(
      Seq(SizedLine("Raport financiar consolidat", 12, 0)) ++
        Seq(header.copy(gapBefore = 14)) ++ rows))
  }

  test("band detection attaches the header line as a spanning row 0") {
    val doc = graft.extract.PdfLayout.buildDoc("doc://hdr", tablePdf())
    val tables = doc.items.flatMap(_.table)
    assert(tables.length == 1, doc.items.map(i => (i.kind, i.text)).mkString("; "))
    val t = tables.head
    assert(t.numRows == 4 && t.numCols == 5, s"${t.numRows}x${t.numCols}")
    val hdr = t.cells.filter(_.columnHeader).sortBy(_.startCol)
    assert(hdr.map(c => (c.startCol, c.endCol, c.text)).toSeq ==
      Seq((0, 1, "Indicatori"), (1, 3, "30/09/2025"), (3, 5, "30/09/2024")))
    // the prose line above stays a text item (not stolen)
    assert(doc.items.exists(i => i.kind == ItemKind.Text &&
      i.text == "Raport financiar consolidat"))
  }

  test("the split RON | number pair collapses end-to-end, as in test_table_fixes.py:181-189") {
    val doc = graft.extract.PdfLayout.buildDoc("doc://hdr", tablePdf())
    val (fixed, counters) = graft.extract.DocTransforms.applyAll(doc)
    assert(counters("collapsed_tables") == 1, counters)
    val t = fixed.items.flatMap(_.table).head
    assert(t.numCols == 3, s"collapsed to ${t.numCols}")
    assert(t.cells.exists(_.text == "RON 158.065.856"), t.cells.map(_.text).mkString("|"))
    assert(t.cells.exists(_.text == "RON 126.792.531"))
    // currency vote sees real per-column currencies now
    val md = graft.extract.MarkdownRender.render(fixed)
    assert(md.contains("| RON 158.065.856 |") || md.contains("RON 158.065.856"), md)
  }

  test("a table without a grouped header keeps the first data row as header (old behavior)") {
    val rows = Seq(
      Seq((72.0, "Col1"), (200.0, "Col2"), (330.0, "Col3")),
      Seq((72.0, "aaa"), (200.0, "bbb"), (330.0, "ccc")),
      Seq((72.0, "ddd"), (200.0, "eee"), (330.0, "fff")))
      .map(cs => SizedLine("", 12, 14, cells = cs))
    val pdf = graft.extract.SyntheticPdf.pdfSized(Seq(rows.head.copy(gapBefore = 0) +: rows.tail))
    val doc = graft.extract.PdfLayout.buildDoc("doc://plain", pdf)
    val t = doc.items.flatMap(_.table).head
    assert(t.numRows == 3 && t.numCols == 3)
    assert(t.cells.filter(_.columnHeader).forall(_.startRow == 0))
    assert(t.cells.forall(c => c.endCol - c.startCol == 1))
  }
  test("X-cut: a side chart's stray axis label does not break the table band") {
    import graft.extract.SyntheticPdf.SizedLine
    // 5-row table at x 72/220/340; a chart region at x 520 with its own
    // label lines; TWO table rows also carry a stray axis label at 520 —
    // without the X-cut those rows have 4 runs vs 3 and the band breaks
    val colX = Seq(72.0, 220.0, 340.0)
    val tableRows = Seq(
      Seq("Indicatori", "Anul curent", "Anul trecut"),
      Seq("Venituri totale", "245.140", "194.356"),
      Seq("Cheltuieli", "158.065", "126.792"),
      Seq("Profit net", "42.916", "31.245"),
      Seq("Active", "418.244", "361.665"))
    val rows = tableRows.zipWithIndex.map { case (cs, i) =>
      val cells = colX.zip(cs) ++
        (if (i == 1) Seq((520.0, "400")) else if (i == 3) Seq((520.0, "200")) else Nil)
      SizedLine("", 10, if (i == 0) 0 else 14, cells = cells)
    }
    val chartLines = Seq(
      SizedLine("", 10, 14, cells = Seq((520.0, "Total"))),
      SizedLine("", 10, 14, cells = Seq((520.0, "Active"))),
      SizedLine("", 10, 14, cells = Seq((520.0, "mil. RON"))),
      SizedLine("", 10, 14, cells = Seq((520.0, "300"))))
    val pdf = graft.extract.SyntheticPdf.pdfSized(Seq(rows ++ chartLines))
    val doc = PdfLayout.buildDoc("doc://xcut", pdf)
    val tables = doc.items.filter(_.table.nonEmpty)
    assert(tables.length == 1, doc.items.map(i => (i.kind, i.text)).mkString("; "))
    val t = tables.head.table.get
    assert(t.numCols == 3 && t.numRows == 5, s"${t.numRows}x${t.numCols}")
    // the axis labels survive as chart-region TEXT, not table cells
    val texts = doc.items.filter(_.table.isEmpty).map(_.text).mkString(" ")
    assert(texts.contains("400") && texts.contains("Total"))
  }

}

class KvLineSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("kvOf: label head + all-value tail splits; prose does not qualify") {
    val p = PdfLayout.kvOf("Active imobilizate - total RON 281.775.783 RON 243.511.009 16,87%")
    assert(p.exists(k => k.key == "Active imobilizate - total" &&
      k.value == "RON 281.775.783 RON 243.511.009 16,87%"))
    // the LAST token must be a value token too — a prose line whose
    // second-to-last token is numeric is NOT a kv line (round-5 review fix)
    assert(PdfLayout.kvOf("Rata a crescut cu 15 procente").isEmpty)
    assert(PdfLayout.kvOf("Compania a investit 23 milioane RON anul trecut").isEmpty)
    // dates and the delta symbol count as values
    assert(PdfLayout.kvOf("Indicatori 30/09/2025 31/12/2024").nonEmpty)
    // all-numeric line (no worded head) does not qualify
    assert(PdfLayout.kvOf("100 200 300").isEmpty)
  }
}
