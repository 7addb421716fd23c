package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.textkit.SpacingRepair.Glyph

class SpacingFixSpec extends AnyFunSuite {
  private def layOut(phrase: String): (Seq[Glyph], Bbox) = {
    var x = 0.0
    val glyphs = phrase.flatMap { ch =>
      if (ch == ' ') { x += 2.5; None }
      else { val g = Glyph(ch.toString, x, 0, x + 1.0, 2.0); x += 1.1; Some(g) }
    }
    (glyphs, Bbox(0, 0, x + 2, 2, Bbox.TopLeft))
  }

  private def tableDoc(cellText: String, bbox: Bbox): Doc =
    Doc("u", Array(DocItem(0, ItemKind.Table, Label.Table, ContentLayer.Body, 1, None, "",
      Some(TableData(1, 1, Array(TableCell(0, 1, 0, 1, 1, 1, cellText,
        columnHeader = false, rowHeader = false, rowSection = false, fillable = false,
        bbox = Some(bbox))))))), Array(PageDim(1, 0, 800)))

  test("detectSpacingPages flags the page holding a spaced cell") {
    val (_, bbox) = layOut("financiar")
    val doc = tableDoc("finan c iar", bbox)
    assert(SpacingFix.detectSpacingPages(doc) == Some(Set(1)))
  }

  test("detectSpacingPages: clean doc yields empty set (no repair pass)") {
    val (_, bbox) = layOut("financiar")
    val doc = tableDoc("Rezultate financiare consolidate", bbox)
    assert(SpacingFix.detectSpacingPages(doc) == Some(Set.empty[Int]))
  }

  test("fixSpacedItems repairs a spaced cell from glyphs") {
    val phrase = "Viteza de rotatie a activelor"
    val (glyphs, bbox) = layOut(phrase)
    val doc = tableDoc("Vi t e z a de ro t a t ie a a ct i v e l or", bbox)
    val pages = SpacingFix.detectSpacingPages(doc)
    val (fixed, report) = SpacingFix.fixSpacedItems(doc, Map(1 -> glyphs), pages)
    assert(report.tableCells == 1)
    assert(fixed.items(0).table.get.cells(0).text == phrase)
  }

  test("fixSpacedItems repairs a spaced text item") {
    val phrase = "cheltuieli financiare totale"
    val (glyphs, bbox) = layOut(phrase)
    val doc = Doc("u", Array(DocItem(0, ItemKind.Text, Label.Text, ContentLayer.Body, 1,
      Some(bbox), "chel t uieli fin a nci a re tot a le", None)), Array(PageDim(1, 0, 800)))
    val (fixed, report) = SpacingFix.fixSpacedItems(doc, Map(1 -> glyphs),
      SpacingFix.detectSpacingPages(doc))
    assert(report.textItems == 1)
    assert(fixed.items(0).text == phrase)
  }

  test("addPictureKpiCaptions attaches KPI text, dedupes against doc text, caps at max") {
    val pic = DocItem(0, ItemKind.Picture, Label.Picture, ContentLayer.Body, 1,
      Some(Bbox(0, 0, 100, 100, Bbox.TopLeft)), "", None)
    val doc = Doc("u", Array(pic), Array(PageDim(1, 0, 800)))
    val kpi = "PROFIT NET RON 42,92 MIL. (EUR 8,45 MIL.) +103,61% vs 9L 2024"
    val (out, added) = SpacingFix.addPictureKpiCaptions(doc, (_, _) => kpi)
    assert(added == 1)
    assert(out.items.exists(i => i.label == Label.Caption && i.text == kpi))
    // second run: caption text is now part of the doc -> deduped
    val (_, added2) = SpacingFix.addPictureKpiCaptions(out, (_, _) => kpi)
    assert(added2 == 0)
  }

  test("addPictureKpiCaptions rejects axis-like picture text") {
    val pic = DocItem(0, ItemKind.Picture, Label.Picture, ContentLayer.Body, 1,
      Some(Bbox(0, 0, 100, 100, Bbox.TopLeft)), "", None)
    val doc = Doc("u", Array(pic), Array(PageDim(1, 0, 800)))
    val (_, added) = SpacingFix.addPictureKpiCaptions(doc,
      (_, _) => "20 0 40 60 80 9L 2024 9L 2025 mil. RON")
    assert(added == 0)
  }

  test("probeBackend picks the higher-scoring parse config (first on ties)") {
    val doc = graft.sources.SyntheticPages.dirtyDoc(42L, 1L)
    val html = graft.sources.SyntheticPages.htmlFor(doc, 42L, 1L)
    val (best, scores) = SpacingFix.probeBackend(doc.url, html)
    assert(scores.keySet == Set("standard", "aggressive"))
    assert(best == scores.maxBy(_._2)._1 ||
      scores("standard") == scores("aggressive") && best == "standard")
  }
}
